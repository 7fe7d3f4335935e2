package graft.api

import java.net.InetSocketAddress
import java.net.URLDecoder
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.DataFrame

/** SURVEY §2.K: the reference's HTTP read surface
  * (fastapi_service/main.py:15-59) as a thin serving edge over
  * [[QueryApi]], on the JDK's built-in `com.sun.net.httpserver` (no
  * extra dependencies).
  *
  * Routes (reference parity):
  *  - `GET /companies/search?name=…` → abn/entity_name/company_name list
  *  - `GET /companies/by_state?state=…` → same projection
  *  - `GET /companies/{abn}` → full record or `{"error": "Company not found"}`
  *
  * The reference declares `/companies/{abn}` BEFORE `/companies/search`,
  * so FastAPI resolves a literal `GET /companies/search` as
  * `abn="search"` and always 404s — the route-shadowing defect SURVEY
  * §2.K documents. Dispatch here is literal-first by construction.
  *
  * Serving shape at scale: this edge is a query GATEWAY, not an
  * operator — every response is bounded (`maxRows`) and computed by the
  * engine's plans (point lookups hit partition-pruned/indexed layouts,
  * see SkewBucketSpec's partitioned-layout test). For production QPS
  * you'd put the unified table in a serving store (the reference uses
  * Postgres); the engine side stays exactly these three builders. */
class QueryHttpServer(unified: DataFrame, port: Int = 0, maxRows: Int = 100) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/companies", new Handler)
  private val pool = Executors.newFixedThreadPool(4)
  server.setExecutor(pool)

  /** Starts the server; returns the bound port (ephemeral when 0). */
  def start(): Int = { server.start(); server.getAddress.getPort }

  /** HttpServer.stop does NOT stop a user-supplied executor, and the
    * pool threads are non-daemon — without the shutdown every
    * create/stop cycle leaks four threads and an embedding JVM never
    * exits. */
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private val slim = Seq("abn", "entity_name", "company_name")

  /** Row → JSON with EXPLICIT nulls (to_json ignoreNullFields=false):
    * Dataset.toJSON silently OMITS null fields, so the point lookup's
    * "full record" would drop website_url/industry keys on exactly the
    * rows the quality report counts as null — the reference API emits
    * "website_url": null, and clients distinguishing null from absent
    * break otherwise. */
  private def jsonArray(df: DataFrame): String =
    df.limit(maxRows)
      .select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(df.columns.map(
          org.apache.spark.sql.functions.col).toIndexedSeq: _*),
        java.util.Collections.singletonMap("ignoreNullFields", "false")))
      .collect().map(_.getString(0)).mkString("[", ",", "]")

  /** Pure routing core (unit-testable without sockets). */
  private[api] def route(path: String, q: Map[String, String]): (Int, String) =
    path.stripPrefix("/companies") match {
      // literal routes FIRST — fixes the reference's shadowing bug
      case "/search" =>
        q.get("name") match {
          case Some(name) if name.nonEmpty =>
            (200, jsonArray(QueryApi.search(unified, name)
              .select(slim.head, slim.tail: _*)))
          case _ => (400, """{"error": "missing required query param: name"}""")
        }
      case "/by_state" =>
        q.get("state") match {
          case Some(st) if st.nonEmpty =>
            (200, jsonArray(QueryApi.byState(unified, st)
              .select(slim.head, slim.tail: _*)))
          case _ => (400, """{"error": "missing required query param: state"}""")
        }
      case s if s.length > 1 && s.startsWith("/") && !s.substring(1).contains("/") =>
        // limit(1): the route's contract is ONE object — with duplicate
        // keys in the table, stripping the array brackets from a
        // multi-row body would emit malformed JSON ('{...},{...}')
        // under status 200
        val body = jsonArray(QueryApi.byKey(unified, s.substring(1)).limit(1))
        if (body == "[]") (404, """{"error": "Company not found"}""")
        else (200, body.substring(1, body.length - 1)) // single object, reference shape
      case _ => (404, """{"error": "no such route"}""")
    }

  private def parseQuery(raw: String): Map[String, String] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8"))
        case Array(k) => Some(URLDecoder.decode(k, "UTF-8") -> "")
        case _ => None
      }
    }.toMap

  private class Handler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val (status, body) =
          if (ex.getRequestMethod != "GET") (405, """{"error": "GET only"}""")
          else {
            // malformed percent-encoding is the CLIENT's error: decode
            // failures must answer 400, not fall into the catch-all 500
            // (which is the gateway's backend-health signal)
            val parsed =
              try Right(parseQuery(ex.getRequestURI.getRawQuery))
              catch { case _: IllegalArgumentException => Left(()) }
            parsed match {
              case Right(q) => route(ex.getRequestURI.getPath, q)
              case Left(_) =>
                (400, """{"error": "malformed percent-encoding in query"}""")
            }
          }
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(status, bytes.length)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      } catch {
        case e: Throwable =>
          val bytes = s"""{"error": "internal"}""".getBytes("UTF-8")
          try {
            ex.sendResponseHeaders(500, bytes.length)
            val os = ex.getResponseBody
            try os.write(bytes) finally os.close()
          } catch { case _: Throwable => () }
      } finally ex.close()
  }
}
