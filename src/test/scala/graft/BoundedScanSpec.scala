package graft

import graft.plans.BoundedScan
import graft.plans.BoundedScan.{Continuation, CursorSpec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The core correctness contract of the pagination engine
  * (chainweb-data BoundedScan.hs:175-254): paging through with ANY scan
  * budget must enumerate exactly the unbounded ordered result. */
class BoundedScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val spec = CursorSpec(Seq("user_id" -> true, "event_id" -> true))

  private def src = Tables.events(spark, sf)
    .select(col("user_id"), col("event_id"), col("event_type"))

  private def unbounded: Seq[(Long, Long)] =
    src.filter(col("event_type") === "click")
      .orderBy(col("user_id").desc, col("event_id").desc)
      .select(col("user_id"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def pageAll(scanLimit: Int, resultLimit: Int,
                      start: Option[Continuation] = None): Seq[(Long, Long)] = {
    var cont = start
    var out = Vector.empty[(Long, Long)]
    var first = true
    while (first || cont.isDefined) {
      first = false
      val (rows, next) = BoundedScan.performBoundedScan(
        src, spec, col("event_type") === "click", scanLimit, resultLimit, cont)
      out ++= rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")))
      cont = next
    }
    out
  }

  test("paging enumerates the unbounded result for any scan budget") {
    val expected = unbounded
    for (scanLimit <- Seq(17, 64, 100000)) {
      assert(pageAll(scanLimit, resultLimit = 13) === expected,
             s"scanLimit=$scanLimit")
    }
  }

  test("paging property: pseudo-random budget/limit/offset combinations") {
    val expected = unbounded
    // deterministic pseudo-random draws — covers sentinel-on-match,
    // budget-equals-page, offset-across-windows edge classes
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 6) {
      val scanLimit = 1 + rng.nextInt(150)
      val resultLimit = 1 + rng.nextInt(20)
      val offset = rng.nextInt(30)
      val got = pageAll(scanLimit, resultLimit,
        Some(Continuation(None, offset)))
      assert(got === expected.drop(offset),
        s"scanLimit=$scanLimit resultLimit=$resultLimit offset=$offset")
    }
  }

  test("initial offset continuation skips exactly offset matches") {
    val expected = unbounded.drop(25)
    assert(pageAll(64, 13, Some(Continuation(None, 25))) === expected)
  }

  test("no matching rows: pages drain the scan and end with None") {
    var cont: Option[Continuation] = None
    var first = true
    var pages = 0
    while (first || cont.isDefined) {
      first = false
      val (rows, next) = BoundedScan.performBoundedScan(
        src, spec, col("event_type") === "no_such_type", 300, 10, cont)
      assert(rows.isEmpty)
      cont = next
      pages += 1
      assert(pages < 20)
    }
    assert(pages >= 3) // 1000 rows / 300 budget → several empty pages
  }

  test("offset larger than match count yields empty result") {
    assert(pageAll(1000, 13, Some(Continuation(None, 1000000))) === Seq.empty)
  }

  test("continuation token codec round-trips") {
    val cases = Seq(
      Continuation(None, 42),
      Continuation(Some(Seq("7", "499")), 0),
      Continuation(Some(Seq("a|b", "c\\d", "")), 9))
    for (c <- cases)
      assert(BoundedScan.decodeToken(BoundedScan.encodeToken(c)) === c)
  }
}
