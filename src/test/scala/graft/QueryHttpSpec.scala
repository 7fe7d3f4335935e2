package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.api.QueryHttpServer

/** SURVEY §2.K: HTTP serving edge over the unified table, including the
  * reference's route-shadowing defect fixed (GET /companies/search must
  * NOT be swallowed by the /companies/{abn} point-lookup route —
  * reference fastapi_service/main.py declares them in shadowing order). */
class QueryHttpSpec extends SparkSpec {
  import spark.implicits._

  private lazy val unified = Seq(
    ("51824753556", "ACME PTY LTD", "Technology", "Active", "1, 0037", "0037", "1", "ACME", 95),
    ("61824753558", "BETA CO", "Mining", "Active", "2, 0074", "0074", "2", "BETA GROUP", 88),
    ("71824753550", "SEARCH HOLDINGS", "Finance", "Active", "3, 0111", "0111", "1", "SEARCHCO", 90))
    .toDF("abn", "entity_name", "entity_type", "entity_status",
      "address", "postcode", "state", "company_name", "merged_confidence")

  private def get(port: Int, pathAndQuery: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$pathAndQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("HTTP edge serves point lookup, search, by_state; literals not shadowed") {
    val srv = new QueryHttpServer(unified)
    val port = srv.start()
    try {
      // point lookup: full record
      val (s1, b1) = get(port, "/companies/51824753556")
      assert(s1 == 200 && b1.contains("\"entity_name\":\"ACME PTY LTD\"")
        && b1.contains("\"merged_confidence\":95"))

      // unknown abn: the reference's not-found shape
      val (s2, b2) = get(port, "/companies/00000000000")
      assert(s2 == 404 && b2.contains("Company not found"))

      // THE regression the reference ships: /companies/search must hit
      // the search route, not resolve as abn="search"
      val (s3, b3) = get(port, "/companies/search?name=beta")
      assert(s3 == 200, s"search shadowed by point-lookup route: $b3")
      assert(b3.contains("\"abn\":\"61824753558\"") && !b3.contains("Company not found"))

      // search matches company_name too (reference ILIKE over both)
      val (s4, b4) = get(port, "/companies/search?name=searchco")
      assert(s4 == 200 && b4.contains("71824753550"))

      // by_state equality
      val (s5, b5) = get(port, "/companies/by_state?state=1")
      assert(s5 == 200 && b5.contains("51824753556") && b5.contains("71824753550")
        && !b5.contains("61824753558"))

      // missing params are 400s, not silent empties
      assert(get(port, "/companies/search")._1 == 400)
      assert(get(port, "/companies/by_state")._1 == 400)

      // malformed percent-encoding is the CLIENT's error: it must
      // answer 400, never a 500 that poisons the gateway's
      // backend-health signal. The JDK HttpServer pre-validates the
      // URI (its own 400) — the handler's decode guard is the second
      // line for any malformed form that slips through. Java's
      // HttpClient also validates client-side, so speak raw HTTP.
      val sock = new java.net.Socket("127.0.0.1", port)
      try {
        val out = sock.getOutputStream
        out.write(("GET /companies/search?name=%zz HTTP/1.1\r\n" +
          "Host: 127.0.0.1\r\nConnection: close\r\n\r\n").getBytes("UTF-8"))
        out.flush()
        val resp = new String(sock.getInputStream.readAllBytes(), "UTF-8")
        assert(resp.startsWith("HTTP/1.1 400"), s"raw response: $resp")
      } finally sock.close()
    } finally srv.stop()
  }

  test("point lookup answers ONE well-formed object even over duplicate keys") {
    // duplicate abn rows reach the edge unchecked; stripping the array
    // brackets from a multi-row body would emit '{...},{...}' — parse
    // the response to prove it is a single valid JSON object
    val dup = unified.unionByName(unified.limit(1))
    val srv = new QueryHttpServer(dup)
    val port = srv.start()
    try {
      val (s, b) = get(port, "/companies/51824753556")
      assert(s == 200)
      assert(b.startsWith("{") && b.endsWith("}") &&
        !b.drop(1).dropRight(1).contains("{"),
        s"body must be one flat JSON object: $b")
    } finally srv.stop()
  }
}
