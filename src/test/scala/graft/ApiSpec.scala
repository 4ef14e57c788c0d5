package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.server.Api
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Serving-layer contract: paging /txs/events with the Graft-Next
  * continuation header enumerates exactly the unbounded ordered result —
  * the reference's Chainweb-Next behavior (Server.hs:239-246,484-491). */
class ApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val client = HttpClient.newHttpClient()

  private def get(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).build(),
                HttpResponse.BodyHandlers.ofString())

  test("bounded event search pages to completion via Graft-Next") {
    val api = new Api(spark, sf, 0)
    api.start()
    try {
      val base = s"http://localhost:${api.boundPort}"
      val ids = scala.collection.mutable.ArrayBuffer[Long]()
      var url = s"$base/txs/events?search=click&limit=37"
      var done = false
      var pages = 0
      while (!done) {
        val resp = get(url)
        assert(resp.statusCode() === 200)
        """"event_id":(\d+)""".r.findAllMatchIn(resp.body())
          .foreach(m => ids += m.group(1).toLong)
        val next = resp.headers().firstValue("Graft-Next")
        if (next.isPresent) {
          url = s"$base/txs/events?search=click&limit=37&next=${next.get}"
          pages += 1
          assert(pages < 50, "runaway pagination")
        } else done = true
      }
      val expected = Tables.events(spark, sf)
        .filter(col("event_type") === "click")
        .orderBy(col("user_id").desc, col("event_id").desc)
        .select("event_id").collect().map(_.getLong(0)).toSeq
      assert(ids.toSeq === expected)
      assert(pages >= 2) // budget actually forced pagination

      val recent = get(s"$base/txs/recent")
      assert(recent.statusCode() === 200)
      assert(""""event_id":""".r.findAllIn(recent.body()).length === 10)

      val stats = get(s"$base/stats")
      assert(stats.body().contains("\"transactionCount\":1000"))
    } finally api.stop()
  }

  test("account history endpoint serves ingested tables with x-chain resolution") {
    import spark.implicits._
    import graft.ingest.{Flatten, Upsert}
    val dir = java.nio.file.Files.createTempDirectory("graft_api_tables").toString
    val hp = Flatten.joined(
      Flatten.parseHeaders(Seq(Fixtures.header1).toDF("value")),
      Flatten.parsePayloads(Seq(Fixtures.payload1).toDF("value")))
    Upsert.mergeAll(spark, dir, Flatten.allTables(hp))

    val api = new Api(spark, sf, 0, tablesDir = Some(dir))
    api.start()
    try {
      val resp = get(s"http://localhost:${api.boundPort}/txs/account/alice")
      assert(resp.statusCode() === 200)
      assert(resp.body().contains("\"requestkey\":\"rk1\""))
      assert(resp.body().contains("\"to_acct\":\"eve\"")) // x-chain resolved

      val det = get(s"http://localhost:${api.boundPort}/txs/tx/rk1")
      assert(det.statusCode() === 200)
      assert(det.body().contains("\"qualname\":\"coin.TRANSFER\"")) // nested events
      assert(det.body().contains("\"pubkey\":\"pkA\""))             // nested signers
    } finally api.stop()
  }
}
