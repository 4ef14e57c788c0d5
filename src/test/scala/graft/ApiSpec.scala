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

  private def getH(url: String, header: (String, String)): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
                  .header(header._1, header._2).build(),
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

  test("Chainweb-Execution-Strategy header selects the unbounded engine; " +
       "both strategies enumerate identical pages") {
    val api = new Api(spark, sf, 0)
    api.start()
    try {
      val base = s"http://localhost:${api.boundPort}"
      // page the same query under each strategy and compare page-by-page
      def pagesOf(strategy: String): Seq[Seq[Long]] = {
        val out = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
        var url = s"$base/txs/events?search=click&limit=37"
        var done = false
        while (!done) {
          val resp = getH(url, "Chainweb-Execution-Strategy" -> strategy)
          assert(resp.statusCode() === 200)
          // the bounded engine reports its scan budget; unbounded has none
          assert(resp.headers().firstValue("Graft-Scan-Limit").isPresent
                   === (strategy == "Bounded"))
          out += """"event_id":(\d+)""".r.findAllMatchIn(resp.body())
            .map(_.group(1).toLong).toSeq
          val next = resp.headers().firstValue("Graft-Next")
          if (next.isPresent) {
            url = s"$base/txs/events?search=click&limit=37&next=${next.get}"
            assert(out.length < 50, "runaway pagination")
          } else done = true
        }
        out.toSeq
      }
      val bounded = pagesOf("Bounded")
      val unbounded = pagesOf("Unbounded")
      // every unbounded page is full-size by construction; the bounded
      // engine may emit short scan-budget pages — the CONTENT must agree
      assert(unbounded.flatten === bounded.flatten)
      assert(unbounded.init.forall(_.length == 37))
      assert(unbounded.length >= 2) // the toggle actually paged

      // offset-param compatibility on the unbounded path (runUnbounded's
      // OFFSET arm) — page 2 via offset equals page 2 via continuation
      val viaOffset = getH(s"$base/txs/events?search=click&limit=37&offset=37",
                           "Chainweb-Execution-Strategy" -> "Unbounded")
      assert(""""event_id":(\d+)""".r.findAllMatchIn(viaOffset.body())
               .map(_.group(1).toLong).toSeq === unbounded(1))

      // the reference 400s on unknown strategy values (Server.hs:258-260)
      val bad = getH(s"$base/txs/events?search=click",
                     "Chainweb-Execution-Strategy" -> "Sideways")
      assert(bad.statusCode() === 400)
      assert(bad.body().contains("Unknown Chainweb-Execution-Strategy"))
      // and on next+offset together (Server.hs:276 mkContinuation)
      val clash = get(s"$base/txs/events?search=click&offset=1&next=MDs")
      assert(clash.statusCode() === 400)
    } finally api.stop()
  }

  test("/txs/search pages a code search over ingested tables to completion") {
    import spark.implicits._
    import graft.ingest.{Flatten, Upsert}
    val dir = java.nio.file.Files.createTempDirectory("graft_api_search").toString
    val hp = Flatten.joined(
      Flatten.parseHeaders(Seq(Fixtures.header1, Fixtures.header2).toDF("value")),
      Flatten.parsePayloads(Seq(Fixtures.payload1, Fixtures.payload2).toDF("value")))
    Upsert.mergeAll(spark, dir, Flatten.allTables(hp))

    val api = new Api(spark, sf, 0, tablesDir = Some(dir))
    api.start()
    try {
      val base = s"http://localhost:${api.boundPort}"
      // "coin.transfer" appears in rk1's code AND — via the continuation
      // chain — in rk2/rk4 (conts with null code inherit the initiating
      // exec's); rk3's code is "(coin.transfer-crosschain)". Everything
      // matches; page with limit=1 to force Graft-Next continuations.
      val keys = scala.collection.mutable.ArrayBuffer[String]()
      var url = s"$base/txs/search?search=coin.transfer&limit=1"
      var pages = 0
      var done = false
      while (!done) {
        val resp = get(url)
        assert(resp.statusCode() === 200)
        """"requestKey":"(rk\d)"""".r.findAllMatchIn(resp.body())
          .foreach(m => keys += m.group(1))
        val next = resp.headers().firstValue("Graft-Next")
        if (next.isPresent) {
          url = s"$base/txs/search?search=coin.transfer&limit=1&next=${next.get}"
          pages += 1
          assert(pages < 20, "runaway pagination")
        } else done = true
      }
      // cursor order: height DESC, requestkey DESC
      assert(keys.toSeq === Seq("rk4", "rk3", "rk2", "rk1"))
      assert(pages >= 3) // limit=1 forced one match per page

      // continuation decoration on a cont row: rk2 chains to rk1
      val one = get(s"$base/txs/search?search=coin.transfer%20%22alice%22&limit=10")
      assert(one.statusCode() === 200)
      assert(one.body().contains("\"requestKey\":\"rk2\"")) // matched via chain code
      assert(one.body().contains("\"initialCode\":\"(coin.transfer"))

      // height-range guard prunes to block 2 only
      val ranged = get(s"$base/txs/search?search=coin&minheight=101")
      assert(""""requestKey":"(rk\d)"""".r.findAllMatchIn(ranged.body())
        .map(_.group(1)).toSet === Set("rk4"))

      // missing search string → error (Server.hs:308 throw404)
      assert(get(s"$base/txs/search?limit=5").statusCode() === 500)

      // unbounded strategy on the tx path: limit=1 paging enumerates the
      // SAME keys in the same order as the bounded engine above
      val ukeys = scala.collection.mutable.ArrayBuffer[String]()
      var uurl = s"$base/txs/search?search=coin.transfer&limit=1"
      var udone = false
      while (!udone) {
        val resp = getH(uurl, "Chainweb-Execution-Strategy" -> "Unbounded")
        assert(resp.statusCode() === 200)
        assert(!resp.headers().firstValue("Graft-Scan-Limit").isPresent)
        """"requestKey":"(rk\d)"""".r.findAllMatchIn(resp.body())
          .foreach(m => ukeys += m.group(1))
        val next = resp.headers().firstValue("Graft-Next")
        if (next.isPresent) {
          uurl = s"$base/txs/search?search=coin.transfer&limit=1&next=${next.get}"
          assert(ukeys.length < 20, "runaway pagination")
        } else udone = true
      }
      assert(ukeys.toSeq === keys.toSeq)
    } finally api.stop()
  }

  test("load-adaptive throttling scales scan budgets under concurrency") {
    // pure factor math (Server.hs:128-132)
    assert(Api.throttlingFactor(0) === 1.0)
    assert(Api.throttlingFactor(3) === 1.0)
    assert(Api.throttlingFactor(6) === 0.5)
    assert(Api.throttlingFactor(30) === 0.1)

    // end-to-end: 12 concurrent requests against a held handler must
    // observe a reduced Graft-Scan-Limit on some request (debugHoldMs keeps
    // all 12 in flight while budgets are computed).
    val api = new Api(spark, sf, 0, debugHoldMs = 300)
    api.start()
    try {
      val base = s"http://localhost:${api.boundPort}"
      val pool = java.util.concurrent.Executors.newFixedThreadPool(12)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futs = (1 to 12).map { _ =>
        scala.concurrent.Future(get(s"$base/txs/events?search=click&limit=5"))
      }
      val resps = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration(120, "s"))
      pool.shutdown()
      val limits = resps.map(_.headers().firstValue("Graft-Scan-Limit").get.toInt)
      assert(limits.min < Api.BaseScanLimit, s"no throttling observed: $limits")
      assert(limits.min >= math.ceil(Api.BaseScanLimit / 4.0).toInt) // 12 in flight → ≥ f(12)
      resps.foreach(r => assert(r.statusCode() === 200))
    } finally api.stop()
  }

  test("/richlist, /coins and cached /stats serve maintenance outputs") {
    import spark.implicits._
    import graft.ingest.{Flatten, Upsert}
    val dir = java.nio.file.Files.createTempDirectory("graft_api_maint").toString
    val out = java.nio.file.Files.createTempDirectory("graft_api_maint_out").toString
    val hp = Flatten.joined(
      Flatten.parseHeaders(Seq(Fixtures.header1).toDF("value")),
      Flatten.parsePayloads(Seq(Fixtures.payload1).toDF("value")))
    Upsert.mergeAll(spark, dir, Flatten.allTables(hp))
    val rep = graft.plans.Maintenance.run(spark, dir, out, genesis = Map(0L -> 100L))
    assert(rep.txCount === 3L)
    assert(rep.maxHeight === 100L)
    // rewards(100) = 100 * 23.045230769230769231 (first schedule segment),
    // allocations(genesis+3000s) = 0 (before the first grant)
    assert(rep.scheduleSupply.doubleValue ===
      graft.operators.Coins.miningRewards(100L).doubleValue)

    val api = new Api(spark, sf, 0, tablesDir = Some(dir), maintDir = Some(out))
    api.start()
    try {
      val base = s"http://localhost:${api.boundPort}"
      val rich = get(s"$base/richlist")
      assert(rich.statusCode() === 200)
      assert(rich.body().contains("bob")) // top balance holders present

      // ChainwebDataStats: exactly {transactionCount, coinsInCirculation}
      val stats = get(s"$base/stats")
      assert(stats.statusCode() === 200)
      assert(stats.body().contains("\"transactionCount\":3"))
      assert(stats.body().contains("\"coinsInCirculation\""))
      assert(!stats.body().contains("maxHeight"))

      // /coins pinned to a deterministic time: height 100, asof genesis+30d;
      // plain-text number (coinsHandler :: Handler Text, Server.hs:227-231)
      val asof = graft.operators.Coins.GenesisEpochSec + 86400L * 30
      val coins = get(s"$base/coins?asof=$asof")
      assert(coins.statusCode() === 200)
      val expected = graft.operators.Coins.circulatingCoins(100L, asof)
      assert(coins.body() === expected.toString)
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
      assert(resp.body().contains("\"requestKey\":\"rk1\""))
      // TransferDetail keeps the STORED (empty) side; the resolution
      // rides in crossChainAccount (Server.hs:543)
      assert(resp.body().contains("\"crossChainAccount\":\"eve\""))

      val det = get(s"http://localhost:${api.boundPort}/txs/tx/rk1")
      assert(det.statusCode() === 200)
      assert(det.body().contains("\"name\":\"coin.TRANSFER\"")) // nested TxEvents
      assert(det.body().contains("\"pubKey\":\"pkA\""))         // nested signers
      assert(det.body().contains("\"sigs\":[{\"sig\":"))
      // /txs/tx returns exactly one row even though the contract tolerates
      // fork copies; /txs/txs returns the full (here: identical) set
      assert(det.body().startsWith("[{") && !det.body().contains("},{\"ttl"))
      val all = get(s"http://localhost:${api.boundPort}/txs/txs/rk1")
      assert(all.statusCode() === 200)
      assert(all.body().contains("\"requestKey\":\"rk1\""))

      // reference-contract event search over the ingested events table:
      // search hits qualname, modulename narrows to the exact module
      val ev = get(s"http://localhost:${api.boundPort}/txs/events?search=TRANSFER")
      assert(ev.statusCode() === 200)
      assert(ev.body().contains("\"name\":\"coin.TRANSFER\""))
      assert(ev.body().contains("\"name\":\"ns1.tok.TRANSFER\""))
      val evMod = get(
        s"http://localhost:${api.boundPort}/txs/events?search=TRANSFER&modulename=tok")
      assert(evMod.statusCode() === 200)
      assert(evMod.body().contains("ns1.tok.TRANSFER"))
      assert(!evMod.body().contains("\"name\":\"coin.TRANSFER\""))
      // param predicate matches inside paramtext JSON
      val evParam = get(
        s"http://localhost:${api.boundPort}/txs/events?param=carol")
      assert(evParam.statusCode() === 200)
      assert(evParam.body().contains("ns1.tok.TRANSFER"))
    } finally api.stop()
  }

  test("DTO field sets match the chainweb-api shapes exactly; /cwd-spec " +
       "serves them") {
    import spark.implicits._
    import graft.ingest.{Flatten, Upsert}
    val dir = java.nio.file.Files.createTempDirectory("graft_api_dto").toString
    val hp = Flatten.joined(
      Flatten.parseHeaders(Seq(Fixtures.header1).toDF("value")),
      Flatten.parsePayloads(Seq(Fixtures.payload1).toDF("value")))
    Upsert.mergeAll(spark, dir, Flatten.allTables(hp))
    val api = new Api(spark, sf, 0, tablesDir = Some(dir))
    api.start()
    try {
      val base = s"http://localhost:${api.boundPort}"
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      def topKeys(json: String): Set[String] = {
        val node = om.readTree(json)
        val o = if (node.isArray) node.get(0) else node
        val it = o.fieldNames(); val b = Set.newBuilder[String]
        while (it.hasNext) b += it.next()
        b.result()
      }
      import graft.server.Dto
      assert(topKeys(get(s"$base/txs/search?search=coin&limit=5").body())
        == Dto.TxSummaryFields.toSet)
      assert(topKeys(get(s"$base/txs/recent").body())
        == Dto.TxSummaryFields.toSet)
      assert(topKeys(get(s"$base/txs/tx/rk1").body())
        == Dto.TxDetailFields.toSet)
      assert(topKeys(get(s"$base/txs/events?search=TRANSFER").body())
        == Dto.EventDetailFields.toSet)
      assert(topKeys(get(s"$base/txs/account/alice").body())
        == Dto.TransferDetailFields.toSet)
      assert(topKeys(get(s"$base/stats").body()) == Dto.StatsFields.toSet)
      // the served OpenAPI document carries the same schemas
      val specDoc = om.readTree(get(s"$base/cwd-spec.json").body())
      val schemas = specDoc.get("components").get("schemas")
      def schemaKeys(n: String): Set[String] = {
        val it = schemas.get(n).get("properties").fieldNames()
        val b = Set.newBuilder[String]; while (it.hasNext) b += it.next()
        b.result()
      }
      assert(schemaKeys("TxSummary") == Dto.TxSummaryFields.toSet)
      assert(schemaKeys("TxDetail") == Dto.TxDetailFields.toSet)
      assert(schemaKeys("EventDetail") == Dto.EventDetailFields.toSet)
      assert(schemaKeys("TransferDetail") == Dto.TransferDetailFields.toSet)
      assert(schemaKeys("ChainwebDataStats") == Dto.StatsFields.toSet)
    } finally api.stop()
  }

  test("oversized or negative continuation offsets are a 400, not a 500") {
    val api = new Api(spark, sf, 0)
    api.start()
    try {
      val base = s"http://localhost:${api.boundPort}"
      // Dataset.offset is Int-bounded; 2^31 would wrap negative inside Spark
      val big = getH(s"$base/txs/events?search=click&offset=${Int.MaxValue.toLong + 1}",
                     "Chainweb-Execution-Strategy" -> "Unbounded")
      assert(big.statusCode() === 400)
      assert(big.body().contains("out of range"))
      val neg = get(s"$base/txs/events?search=click&offset=-1")
      assert(neg.statusCode() === 400)
    } finally api.stop()
  }

  test("request-path reads are snapshot-pinned: uncommitted table files are " +
       "invisible to every endpoint until a commit publishes them") {
    import spark.implicits._
    import graft.ingest.{Flatten, Upsert}
    val dir = java.nio.file.Files.createTempDirectory("graft_api_pin").toString
    val hp = Flatten.joined(
      Flatten.parseHeaders(Seq(Fixtures.header1).toDF("value")),
      Flatten.parsePayloads(Seq(Fixtures.payload1).toDF("value")))
    Upsert.mergeAll(spark, dir, Flatten.allTables(hp))
    val api = new Api(spark, sf, 0, tablesDir = Some(dir))
    api.start()
    try {
      val base = s"http://localhost:${api.boundPort}"
      val ev0 = get(s"$base/txs/events?search=TRANSFER").body()
      assert(ev0.contains("\"blockTime\":")) // extras decoration present
      val st0 = get(s"$base/stats").body()
      val count0 = """"transactionCount":(\d+)""".r
        .findFirstMatchIn(st0).get.group(1).toLong
      // Rogue UNCOMMITTED appends: duplicate a committed part file in place.
      // A raw spark.read.parquet would list it (doubling the row set); the
      // snapshot-pinned request path must not see it until a commit.
      def dupPart(table: String): Unit = {
        val td = java.nio.file.Paths.get(dir, table)
        // duplicate the LARGEST part file — with more shuffle partitions
        // than rows, some parts are 0-row parquet shells and Files.list
        // order is filesystem-dependent (picking one made the strictly-
        // grows assertion below flake)
        import scala.jdk.CollectionConverters._
        val part = java.nio.file.Files.list(td).iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .maxBy(java.nio.file.Files.size)
        java.nio.file.Files.copy(part, td.resolve("rogue-uncommitted.parquet"))
        ()
      }
      dupPart("transactions")
      dupPart("blocks")
      assert(get(s"$base/stats").body() === st0,
        "stats must count the pinned transactions snapshot")
      assert(get(s"$base/txs/events?search=TRANSFER").body() === ev0,
        "event-search extras must read the pinned blocks snapshot")
      // a commit publishes the next version to subsequent requests
      graft.sources.Snapshots.commit(spark, s"$dir/transactions")
      val st1 = get(s"$base/stats").body()
      val count1 = """"transactionCount":(\d+)""".r
        .findFirstMatchIn(st1).get.group(1).toLong
      // the duplicated part file holds ≥1 of the rows (the table may span
      // several part files), so the committed count strictly grows
      assert(count1 > count0)
    } finally api.stop()
  }
}
