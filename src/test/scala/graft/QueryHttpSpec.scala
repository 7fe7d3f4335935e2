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
    } finally srv.stop()
  }
}
