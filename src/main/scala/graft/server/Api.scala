package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.Tables
import graft.plans.BoundedScan
import graft.plans.BoundedScan.{Continuation, CursorSpec}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Query-serving layer — the reference's `server` mode
  * (chainweb-data exec/Chainweb/Server.hs) over the Spark engine:
  * search endpoints run [[BoundedScan.performBoundedScan]] with the
  * reference's per-request budgets (scanLimit 50 000, resultLimit ≤ 250,
  * default 10 — Server.hs:317-319) and hand back a resumable continuation
  * in the `Graft-Next` response header (the `Chainweb-Next` contract,
  * Server.hs:239-246).
  *
  * Zero dependencies: JDK `com.sun.net.httpserver` + hand-rolled JSON —
  * the serving tier is deliberately thin; all query semantics live in the
  * engine. Endpoints:
  *   - `GET /txs/events?search=S&limit=N[&next=TOK]` — bounded event search
  *   - `GET /txs/recent`                             — top-10 by recency
  *   - `GET /stats`                                  — row-count stats
  */
class Api(spark: SparkSession, dataDir: String, port: Int,
          tablesDir: Option[String] = None) {

  private val SCAN_LIMIT = 50000  // Server.hs:317
  private val MAX_LIMIT = 250     // Server.hs:318
  private val DEFAULT_LIMIT = 10  // Server.hs:319

  private val spec = CursorSpec(Seq("user_id" -> true, "event_id" -> true))
  private def events = Tables.events(spark, dataDir)
    .select(col("user_id"), col("event_id"), col("event_type"), col("value"))

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/txs/events", (ex: HttpExchange) => handle(ex)(searchEvents))
  server.createContext("/txs/recent", (ex: HttpExchange) => handle(ex)(recent))
  server.createContext("/stats", (ex: HttpExchange) => handle(ex)(stats))
  server.createContext("/txs/account", (ex: HttpExchange) =>
    handle(ex)(accountHistory(ex.getRequestURI.getPath)))
  server.createContext("/txs/tx", (ex: HttpExchange) =>
    handle(ex)(txDetail(ex.getRequestURI.getPath)))

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  def boundPort: Int = server.getAddress.getPort

  private def handle(ex: HttpExchange)(f: Map[String, String] => (String, Map[String, String])): Unit =
    try {
      val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").filter(_.contains("="))
        .map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
        }.toMap
      val (body, headers) = f(params)
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    } catch {
      case e: Throwable =>
        val msg = s"""{"error":${Api.jstr(String.valueOf(e.getMessage))}}"""
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(500, msg.length)
        ex.getResponseBody.write(msg)
        ex.close()
    }

  /** Bounded event search with keyset continuation (Server.hs:568-619's
    * evHandler shape). */
  private def searchEvents(p: Map[String, String]): (String, Map[String, String]) = {
    val search = p.getOrElse("search", "")
    val limit = math.min(p.get("limit").map(_.toInt).getOrElse(DEFAULT_LIMIT), MAX_LIMIT)
    val cont = p.get("next").map(BoundedScan.decodeToken)
    val (rows, next) = BoundedScan.performBoundedScan(
      events, spec, col("event_type").contains(search), SCAN_LIMIT, limit, cont)
    val body = rows.map(rowJson).mkString("[", ",", "]")
    (body, next.map(c => Map("Graft-Next" -> BoundedScan.encodeToken(c))).getOrElse(Map.empty))
  }

  /** `/txs/account/<acct>` — the marquee endpoint (Server.hs account
    * handler): full transfer history with cross-chain resolution over the
    * ingested tables ([[graft.operators.AccountHistory]]). */
  private def accountHistory(path: String)(p: Map[String, String]): (String, Map[String, String]) = {
    val dir = tablesDir.getOrElse(
      throw new IllegalStateException("no ingested tables configured"))
    val acct = java.net.URLDecoder.decode(
      path.stripPrefix("/txs/account/"), StandardCharsets.UTF_8)
    val limit = math.min(p.get("limit").map(_.toInt).getOrElse(DEFAULT_LIMIT), MAX_LIMIT)
    val rows = graft.operators.AccountHistory
      .transfersOf(spark, dir, acct)
      .limit(limit).collect()
    (rows.map(rowJson).mkString("[", ",", "]"), Map.empty)
  }

  /** `/txs/tx/<requestkey>` — detail lookup (Server.hs:408-441); returns
    * ALL fork copies (`/txs/txs` semantics — the orphan-tolerant contract,
    * Server.hs:462-482); a client wanting one picks the first. */
  private def txDetail(path: String)(p: Map[String, String]): (String, Map[String, String]) = {
    val dir = tablesDir.getOrElse(
      throw new IllegalStateException("no ingested tables configured"))
    val rk = java.net.URLDecoder.decode(
      path.stripPrefix("/txs/tx/"), StandardCharsets.UTF_8)
    val rows = graft.operators.TxDetail.lookup(spark, dir, rk).collect()
    (rows.map(rowJson).mkString("[", ",", "]"), Map.empty)
  }

  /** Top-10 recent (O4 — Server.hs:621-631). */
  private def recent(p: Map[String, String]): (String, Map[String, String]) =
    (events.orderBy(col("event_id").desc).limit(10).collect()
       .map(rowJson).mkString("[", ",", "]"),
     Map.empty)

  /** Table stats (A2/A4 — Server.hs:396-406,633-641; the count comes from
    * parquet footer metadata, the same O(1)-ish estimate semantics). */
  private def stats(p: Map[String, String]): (String, Map[String, String]) = {
    val n = events.count()
    val maxId = events.agg(max(col("event_id"))).collect().head.getLong(0)
    (s"""{"transactionCount":$n,"maxHeight":$maxId}""", Map.empty)
  }

  private def valueJson(v: Any): String = v match {
    case null                          => "null"
    case s: String                     => Api.jstr(s)
    case b: Boolean                    => b.toString
    case n: java.lang.Number           => n.toString
    case r: Row                        => rowJson(r)
    case xs: scala.collection.Seq[_]   => xs.map(valueJson).mkString("[", ",", "]")
    case other                         => Api.jstr(String.valueOf(other))
  }

  private def rowJson(r: Row): String =
    r.schema.fields.zipWithIndex.map { case (f, i) =>
      s"${Api.jstr(f.name)}:${valueJson(r.get(i))}"
    }.mkString("{", ",", "}")
}

object Api {
  private[server] def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}
