package graft.http

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.GraftEngine
import graft.plan.TimeContext
import graft.sql.{Ast, SqlParser}

/**
 * Minimal REST surface mirroring the reference's HTTP API
 * (`nsdb-http/.../routes/QueryApi.scala:138-189`, `DataApi.scala:74-102`):
 *
 *  - `POST /query` `{db, namespace, queryString, from?, to?}` →
 *    `{"records": [...]}` — `from`/`to` are ANDed into the statement as a
 *    timestamp range before planning (the P10 enrichment path)
 *  - `POST /data` `{db, namespace, metric, bit:{timestamp?, value,
 *    dimensions?, tags?}}` → insert one record
 *  - `GET /commands/<db>/<namespace>/metrics` → metric listing
 *
 * Uses only the JDK http server + the Jackson shipped with Spark — no new
 * dependencies. Single-threaded executor: the engine call dominates, and
 * queries fan out inside Spark anyway.
 */
class HttpApi(engine: GraftEngine, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  /** live plain-query subscription: predicate + the open SSE exchange. */
  private final case class LiveSub(pred: Option[graft.sql.Ast.Predicate], ex: HttpExchange)
  private val subs = new java.util.concurrent.CopyOnWriteArrayList[LiveSub]()

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/query", (ex: HttpExchange) => handle(ex)(handleQuery))
    server.createContext("/data", (ex: HttpExchange) => handle(ex)(handleData))
    server.createContext("/commands", (ex: HttpExchange) => handle(ex)(handleCommands))
    server.createContext("/subscribe", (ex: HttpExchange) => handleSubscribe(ex))
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-http"); t.setDaemon(true); t
    }))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    subs.forEach(s => Try(s.ex.close()))
    subs.clear()
    if (server != null) server.stop(0)
  }

  private def handle(ex: HttpExchange)(f: HttpExchange => (Int, String)): Unit = {
    val (status, body) = Try(f(ex)) match {
      case Success(r)   => r
      case Failure(err) => (500, s"""{"error":${mapper.writeValueAsString(err.getMessage)}}""")
    }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def readJson(ex: HttpExchange): JsonNode =
    mapper.readTree(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))

  private def handleQuery(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "POST") return (405, """{"error":"POST required"}""")
    val req = readJson(ex)
    val db  = req.path("db").asText("default")
    val ns  = req.path("namespace").asText("default")
    val q   = req.path("queryString").asText("")
    implicit val tc: TimeContext = TimeContext(System.currentTimeMillis())
    SqlParser.parse(db, ns, q) match {
      case Right(sel: Ast.SelectStatement) =>
        // optional from/to enrichment, reference QueryEnriched semantics
        val enriched =
          if (req.has("from") && req.has("to"))
            sel.enrichWithTimeRange("timestamp", req.get("from").asLong(), req.get("to").asLong())
          else sel
        engine.executeStatement(enriched) match {
          case Right(df) =>
            val records = df.toJSON.collect().mkString(",")
            (200, s"""{"records":[$records]}""")
          case Left(err) => (400, s"""{"error":${mapper.writeValueAsString(err)}}""")
        }
      case Right(_)  => (400, """{"error":"only select statements on /query"}""")
      case Left(err) => (400, s"""{"error":${mapper.writeValueAsString(err)}}""")
    }
  }

  private def handleData(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "POST") return (405, """{"error":"POST required"}""")
    val req = readJson(ex)
    val bit = req.path("bit")
    def fields(node: JsonNode): Map[String, Any] =
      if (node.isMissingNode) Map.empty
      else node.properties().asScala.map { e =>
        val v = e.getValue
        e.getKey -> (if (v.isIntegralNumber) v.asLong() else if (v.isNumber) v.asDouble() else v.asText(): Any)
      }.toMap
    val value: Any =
      if (bit.path("value").isIntegralNumber) bit.path("value").asLong() else bit.path("value").asDouble()
    val stmt = Ast.InsertStatement(
      req.path("db").asText("default"),
      req.path("namespace").asText("default"),
      req.path("metric").asText(""),
      if (bit.has("timestamp")) Some(bit.get("timestamp").asLong()) else None,
      fields(bit.path("dimensions")),
      fields(bit.path("tags")),
      value
    )
    implicit val tc: TimeContext = TimeContext(System.currentTimeMillis())
    engine.executeStatement(stmt) match {
      case Right(_) =>
        // fan out to live subscribers (reference: WriteCoordinator fires
        // PublishRecord to the PublisherActor on every write)
        publish(Map("timestamp" -> stmt.timestamp.getOrElse(tc.currentTime), "value" -> value) ++
          stmt.dimensions ++ stmt.tags)
        (200, """{"inserted":1}""")
      case Left(err) => (400, s"""{"error":${mapper.writeValueAsString(err)}}""")
    }
  }

  /**
   * SSE pub/sub subscription (the reference's WebSocket streaming mode,
   * `docs/Websocket.md` / `PublisherActor`): `GET /subscribe?db=..&namespace=..
   * &q=<url-encoded select>` streams the historical result as the first
   * event, then one event per future matching record — matching happens
   * per write against the registered predicate, mirroring the reference's
   * single-document `TemporaryIndex` evaluation.
   */
  private def handleSubscribe(ex: HttpExchange): Unit = {
    val params = Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").collect {
      case kv if kv.contains("=") =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
    }.toMap
    val db = params.getOrElse("db", "default")
    val ns = params.getOrElse("namespace", "default")
    val q  = params.getOrElse("q", "")
    implicit val tc: TimeContext = TimeContext(System.currentTimeMillis())
    SqlParser.parse(db, ns, q) match {
      case Right(sel: Ast.SelectStatement) if sel.groupBy.isEmpty =>
        val historical = engine.executeStatement(sel) match {
          case Right(df) => df.toJSON.collect().mkString(",")
          case Left(_)   => "" // metric may not exist yet — start empty
        }
        ex.getResponseHeaders.set("Content-Type", "text/event-stream")
        ex.getResponseHeaders.set("Cache-Control", "no-cache")
        ex.sendResponseHeaders(200, 0) // chunked
        val out = ex.getResponseBody
        out.write(s"""data: {"historical":[$historical]}\n\n""".getBytes(StandardCharsets.UTF_8))
        out.flush()
        subs.add(LiveSub(sel.where, ex))
      case Right(_: Ast.SelectStatement) =>
        // aggregated subscription → periodic re-execution (reference R6:
        // group-by queries are re-run on a fixed scheduler and re-pushed)
        val interval = params.get("refresh_ms").map(_.toLong).getOrElse(1000L)
        ex.getResponseHeaders.set("Content-Type", "text/event-stream")
        ex.getResponseHeaders.set("Cache-Control", "no-cache")
        ex.sendResponseHeaders(200, 0)
        val out = ex.getResponseBody
        lazy val handle: AutoCloseable = graft.streaming.Subscriptions.periodic(
          engine, db, ns, q, interval,
          rows => {
            val json = rows.map(r =>
              mapper.writeValueAsString(r.schema.fieldNames.zip(r.toSeq).toMap.asJava)).mkString(",")
            Try {
              out.write(s"""data: {"records":[$json]}\n\n""".getBytes(StandardCharsets.UTF_8))
              out.flush()
            }.failed.foreach { _ => handle.close(); Try(ex.close()) } // dead client
          })
        handle // materialize the scheduler
        ()
      case Right(_) =>
        handle(ex)(_ => (400, """{"error":"only select statements can be subscribed"}"""))
      case Left(err) =>
        handle(ex)(_ => (400, s"""{"error":${mapper.writeValueAsString(err)}}"""))
    }
  }

  /** push a freshly-written record to every matching live subscription. */
  private def publish(record: Map[String, Any]): Unit = {
    implicit val tc: TimeContext = TimeContext(System.currentTimeMillis())
    subs.forEach { sub =>
      val hit = sub.pred.forall(p => graft.exec.PredicateEval.matches(p, record, tc))
      if (hit) {
        val json = mapper.writeValueAsString(record.asJava)
        Try {
          sub.ex.getResponseBody.write(s"data: $json\n\n".getBytes(StandardCharsets.UTF_8))
          sub.ex.getResponseBody.flush()
        }.failed.foreach(_ => subs.remove(sub)) // dead client: drop
      }
    }
  }

  private def handleCommands(ex: HttpExchange): (Int, String) = {
    // /commands/<db>/<namespace>/metrics
    val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
    parts match {
      case Array("commands", db, ns, "metrics") =>
        engine.command(db, ns, Ast.ShowMetrics) match {
          case Right(rows) =>
            (200, rows.flatten.map(mapper.writeValueAsString).mkString("""{"metrics":[""", ",", "]}"))
          case Left(err) => (400, s"""{"error":${mapper.writeValueAsString(err)}}""")
        }
      case _ => (404, """{"error":"unknown command"}""")
    }
  }
}
