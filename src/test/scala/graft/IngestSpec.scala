package graft

import java.nio.file.Files

import graft.ingest.{Flatten, Upsert}
import graft.streaming.Listen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Flattening semantics ported from the reference (fixture is hand-built to
  * the wire shapes of chainweb-data exec/Chainweb/Lookups.hs:141-160):
  * coinbase 'cb' sentinel, qualname namespace composition, TRANSFER shape
  * filter, amount cascade, signer×sig zip, exec/cont + good/bad splits,
  * and idempotent PK merge (replay = no-op). */
class IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val header1 =
    """{"chainId":0,"height":100,"hash":"blk1","parent":"blk0",
      |"creationTime":1600000000000000,"payloadHash":"ph1","nonce":"12345",
      |"target":"9876543210","weight":"1111","epochStart":1599999000000000,
      |"featureFlags":0,"powHash":"pow1"}""".stripMargin.replaceAll("\n", "")

  private val payload1 =
    """{"payloadHash":"ph1",
      |"minerData":{"account":"miner1","publicKeys":["k1","k2"]},
      |"transactions":[
      | {"requestKey":"rk1",
      |  "cmd":{"payload":{"exec":{"code":"(coin.transfer \"alice\" \"bob\" 1.5)","data":{"note":1}}},
      |         "signers":[{"pubKey":"pkA","scheme":"ED25519","caps":[]},{"pubKey":"pkB","scheme":"ED25519","caps":[]}],
      |         "nonce":"n1",
      |         "meta":{"chainId":"0","sender":"alice","gasLimit":1000,"gasPrice":1.0e-5,"ttl":600,"creationTime":1600000000}},
      |  "sigs":[{"sig":"sigA"},{"sig":"sigB"}],
      |  "result":{"gas":5,"status":"success","data":{"ok":true},"txId":7,"logs":"lh1","continuation":null,
      |    "events":[
      |      {"name":"TRANSFER","module":{"namespace":null,"name":"coin"},"moduleHash":"mh1","params":["alice","bob",{"decimal":"1.5"}]},
      |      {"name":"TRANSFER","module":{"namespace":"ns1","name":"tok"},"moduleHash":"mh2","params":["alice","carol",{"int":2}]},
      |      {"name":"NOTIFY","module":{"namespace":null,"name":"coin"},"moduleHash":"mh1","params":["x"]}]}},
      | {"requestKey":"rk2",
      |  "cmd":{"payload":{"cont":{"pactId":"rk1","rollback":false,"step":1,"data":{},"proof":"pf"}},
      |         "signers":[{"pubKey":"pkC","scheme":"ED25519","caps":[]}],
      |         "nonce":"n2",
      |         "meta":{"chainId":"0","sender":"bob","gasLimit":500,"gasPrice":2.0e-5,"ttl":600,"creationTime":1600000060}},
      |  "sigs":[{"sig":"sigC"}],
      |  "result":{"gas":3,"status":"failure","data":{"error":"boom"},"txId":8,"logs":"lh2","continuation":null,
      |    "events":[
      |      {"name":"TRANSFER","module":{"namespace":null,"name":"coin"},"moduleHash":"mh1","params":["bob","dave","3.25"]}]}}],
      |"coinbase":{"gas":0,"status":"success",
      |  "events":[{"name":"TRANSFER","module":{"namespace":null,"name":"coin"},"moduleHash":"mh1","params":["","miner1",0.98]}]}}
      |""".stripMargin.replaceAll("\n", "")

  private def flattened = {
    import spark.implicits._
    val hp = Flatten.joined(
      Flatten.parseHeaders(Seq(header1).toDF("value")),
      Flatten.parsePayloads(Seq(payload1).toDF("value")))
    Flatten.allTables(hp)
  }

  test("blocks/minerkeys flatten") {
    val b = flattened("blocks")._1.collect()
    assert(b.length === 1)
    assert(b.head.getAs[String]("miner") === "miner1")
    assert(b.head.getAs[String]("target") === "9876543210") // 80-digit-safe string
    assert(flattened("minerkeys")._1.collect().map(_.getAs[String]("key")).sorted
      === Array("k1", "k2"))
  }

  test("transactions: exec/cont and good/bad result splits") {
    val tx = flattened("transactions")._1.collect()
      .map(r => r.getAs[String]("requestkey") -> r).toMap
    assert(tx("rk1").getAs[String]("code").startsWith("(coin.transfer"))
    assert(tx("rk1").getAs[String]("pactid") === null)
    assert(tx("rk1").getAs[String]("goodresult") != null)
    assert(tx("rk1").getAs[String]("badresult") === null)
    assert(tx("rk1").getAs[Long]("num_events") === 3)
    assert(tx("rk2").getAs[String]("code") === null) // continuation
    assert(tx("rk2").getAs[String]("pactid") === "rk1")
    assert(tx("rk2").getAs[String]("goodresult") === null)
    assert(tx("rk2").getAs[String]("badresult").contains("boom"))
  }

  test("events: coinbase sentinel and qualname composition") {
    val ev = flattened("events")._1.collect()
    assert(ev.length === 5) // 3 + 1 + 1 coinbase
    val cb = ev.filter(_.getAs[String]("requestkey") == "cb")
    assert(cb.length === 1 && cb.head.getAs[String]("qualname") === "coin.TRANSFER")
    val quals = ev.map(_.getAs[String]("qualname")).toSet
    assert(quals.contains("ns1.tok.TRANSFER")) // namespaced
    assert(quals.contains("coin.NOTIFY"))
  }

  test("signers: signer × sig zip by idx") {
    val s = flattened("signers")._1.collect()
      .map(r => (r.getAs[String]("requestkey"), r.getAs[Int]("idx"),
                 r.getAs[String]("pubkey"), r.getAs[String]("sig"))).sorted
    assert(s === Array(("rk1", 0, "pkA", "sigA"), ("rk1", 1, "pkB", "sigB"),
                       ("rk2", 0, "pkC", "sigC")))
  }

  test("transfers: TRANSFER shape filter + amount cascade") {
    val t = flattened("transfers")._1.collect()
      .map(r => (r.getAs[String]("requestkey"), r.getAs[String]("from_acct"),
                 r.getAs[String]("to_acct"),
                 r.getAs[java.math.BigDecimal]("amount").doubleValue))
    // NOTIFY (1 param) excluded; decimal/int/number/string cascades all land.
    assert(t.toSet === Set(
      ("rk1", "alice", "bob", 1.5),    // {"decimal":"1.5"}
      ("rk1", "alice", "carol", 2.0),  // {"int":2}
      ("rk2", "bob", "dave", 3.25),    // "3.25" string
      ("cb", "", "miner1", 0.98)))     // bare number, coinbase row
  }

  test("upsert merge is idempotent (replay = no-op)") {
    val dir = Files.createTempDirectory("graft_upsert").toString
    val first = Upsert.mergeAll(spark, dir, flattened)
    assert(first("blocks") === 1 && first("events") === 5 && first("transfers") === 4)
    val replay = Upsert.mergeAll(spark, dir, flattened)
    assert(replay.values.sum === 0)
    assert(spark.read.parquet(s"$dir/events").count() === 5)
  }

  test("streaming listen: drop-zone → 6 tables, effectively-once") {
    val zone = Files.createTempDirectory("graft_zone").toString
    val tables = Files.createTempDirectory("graft_tables").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val env = s"""{"header":${header1},"payload":${payload1}}"""
    Files.writeString(java.nio.file.Path.of(zone, "b1.json"), env)
    val q = Listen.stream(spark, zone, tables, ckpt)
    q.processAllAvailable()
    assert(spark.read.parquet(s"$tables/transactions").count() === 2)
    // replay the same block under a new file name → no duplicates
    Files.writeString(java.nio.file.Path.of(zone, "b1_replay.json"), env)
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(s"$tables/transactions").count() === 2)
    assert(spark.read.parquet(s"$tables/events").count() === 5)
  }

  test("multimodal decode stub: partition-parallel binary → features") {
    val media = graft.operators.Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val feats = graft.operators.Multimodal.decodeFeatures(media)
    val row = feats.filter(col("doc_id") === 0).collect().head
    assert(row.getAs[Long]("n_bytes") > 0)
    val mb = row.getAs[Double]("mean_byte")
    assert(mb > 0.0 && mb < 256.0)
    assert(feats.count() === media.count())
  }
}
