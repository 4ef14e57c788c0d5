package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Step-function / as-of lookup — the coin-supply pattern (SURVEY §2.4 A5,
  * §2.10 X6: chainweb-data exec/Chainweb/Coins.hs:118-158 builds a
  * cumulative reward schedule and answers `lookupLE(height)` point
  * queries).
  *
  * Spark-first shape (X6's prescribed design): the step table is a
  * DIMENSION — thousands of rows — so it is collected once, sorted, and
  * broadcast; the probe side then does a per-row binary search inside a
  * scalar UDF. The probe scan stays embarrassingly parallel: no shuffle,
  * no window, no join exchange — at 100 TB the plan is scan → project,
  * which is the only shape that survives that scale for a step lookup.
  * (The alternatives lose: a range join fans out |steps| rows per probe; a
  * global `last_value IGNORE NULLS` window over the union serializes the
  * probe stream through one task.)
  */
object AsOfJoin {

  /** Sorted cumulative step schedule over `part` (stand-in for the reward
    * CSV — same shape: ordered key + cumulative decimal-exact sum rendered
    * to double). The broadcast-binary-search contract already requires the
    * schedule to fit on the driver, so the prefix sum runs THERE, on the
    * collected dimension — one scan job, no windows (exactly the
    * reference's 1,435-row driver loop, Coins.hs:152-158). Decimal
    * semantics replicate `Relational.dec`/`asMoney` bit-for-bit:
    * double → DECIMAL(18,6) HALF_UP, exact accumulation, render via
    * DECIMAL(38,4) HALF_UP → double. Fact-sized inputs use the
    * distributed [[PrefixSum]] (q21) / [[bucketed]] (q76) instead. */
  private def collectSteps(spark: SparkSession, dir: String): (Array[Long], Array[Double]) = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val rows = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_retailprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    var acc = JBD.ZERO
    val ks = new Array[Long](rows.length)
    val cums = new Array[Double](rows.length)
    var i = 0
    while (i < rows.length) {
      acc = acc.add(JBD.valueOf(rows(i)._2).setScale(6, RoundingMode.HALF_UP))
      ks(i) = rows(i)._1
      cums(i) = acc.setScale(4, RoundingMode.HALF_UP).doubleValue()
      i += 1
    }
    (ks, cums)
  }

  /** q40 — for each event, the cumulative supply as of its probe key
    * (`lookupLE`): broadcast binary search over the sorted step table. */
  def q40AsofSupply(spark: SparkSession, dir: String): DataFrame = {
    val (ks, cums) = collectSteps(spark, dir)
    val bc = spark.sparkContext.broadcast((ks, cums))
    val lookupLE = udf { probe: Long =>
      val (keys, vals) = bc.value
      var idx = java.util.Arrays.binarySearch(keys, probe)
      if (idx < 0) idx = -idx - 2 // insertion point - 1 = greatest key <= probe
      if (idx < 0) None else Some(vals(idx))
    }
    Tables.events(spark, dir).select(
      col("event_id"),
      (col("event_id") % 2000).as("probe_k"),
      lookupLE(col("event_id") % 2000).as("supply"))
      .orderBy(col("event_id"))
  }

  /** DuckDB spells the same semantics natively (`ASOF LEFT JOIN`). */
  val asofOracle: String =
    """WITH steps AS (
      |  SELECT p_partkey AS k,
      |    CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6)))
      |         OVER (ORDER BY p_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS DECIMAL(38,4)) AS DOUBLE) AS cum
      |  FROM part),
      |probes AS (SELECT event_id, event_id % 2000 AS probe_k FROM events)
      |SELECT p.event_id, p.probe_k, s.cum AS supply
      |FROM probes p ASOF LEFT JOIN steps s ON p.probe_k >= s.k
      |ORDER BY p.event_id""".stripMargin

  // -------------------------------------------------------------------------
  // Distributed big-big as-of join (no broadcast side)
  // -------------------------------------------------------------------------

  /** Keyed as-of join where BOTH sides are fact-scale — the case q40's
    * broadcast binary search cannot take (the build side no longer fits on
    * the driver). Semantics: for every probe row, the build row with the
    * greatest `time <= probe.time` on the same `key` (ties at equal time
    * match, i.e. `>=`), appended as `payload` columns (null when no such
    * row — LEFT semantics). DuckDB spells this `ASOF LEFT JOIN`; Spark has
    * no operator for it, and the two obvious plans both die at scale: a
    * range join fans out |build-per-key| rows per probe, and a union window
    * partitioned only by `key` serializes hot keys through single tasks.
    *
    * Scale shape (two-phase, the [[PrefixSum]] pattern applied to time):
    *   1. bucket both sides by `(key, time DIV bucketWidth)`;
    *   2. per-(key,bucket) build summaries (`max(struct(time, payload*))` —
    *      algebraic, map-side partial);
    *   3. carry-in: one per-KEY window over the summary relation (rows per
    *      key = occupied buckets, bounded by timespan/bucketWidth —
    *      independent of fact cardinality) finds the last build row in any
    *      EARLIER bucket for each probe-occupied bucket;
    *   4. one window partitioned by `(key, bucket)` over
    *      carry ∪ build ∪ probe, ordered (carry, then time, build-before-
    *      probe at equal time), resolves every probe via
    *      `last(payload, ignoreNulls)`.
    * Every exchange is keyed by `(key, bucket)` except the summary window's
    * `key` — all fine-grained; no single-partition stage, nothing
    * broadcast, partition size bounded by bucketWidth (the skew knob).
    *
    * Contract: `time` is a LONG column name present in both sides (epoch
    * micros in q76); when a build key has several rows at the same time the
    * lexicographically greatest payload wins (deterministic).
    */
  def bucketed(probe: DataFrame, build: DataFrame, key: String, time: String,
               payload: Seq[String], bucketWidth: Long): DataFrame = {
    val pb = probe.withColumn("__b", expr(s"$time DIV ${bucketWidth}L"))
    val bb = build.withColumn("__b", expr(s"$time DIV ${bucketWidth}L"))
    val pay = struct((col(time) +: payload.map(col)): _*)

    // (2) last build row per occupied (key, bucket)
    val summary = bb.groupBy(col(key), col("__b")).agg(max(pay).as("__last"))
    val payType = summary.schema("__last").dataType

    // (3) carry-in: probe-bucket markers sort BEFORE same-bucket summaries,
    // so the running last sees only strictly-earlier buckets.
    val markers = pb.select(col(key), col("__b")).distinct()
      .select(col(key), col("__b"), lit(0).as("__tag"),
              lit(null).cast(payType).as("__last"))
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__b"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = summary.select(col(key), col("__b"), lit(1).as("__tag"), col("__last"))
      .unionByName(markers)
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wCarry))
      .filter(col("__tag") === 0 && col("__carry").isNotNull)
      .select(col(key), col("__b"), col("__carry"))

    // (4) in-bucket resolution: carry first, then time order, build rows
    // before probe rows at equal time (>= semantics).
    val probeRow = struct(probe.columns.map(col): _*)
    val rowType = pb.select(probeRow.as("__row")).schema("__row").dataType
    val probeSide = pb.select(col(key), col("__b"), lit(1).as("__k1"),
      col(time).as("__t"), lit(1).as("__k3"),
      lit(null).cast(payType).as("__pay"), probeRow.as("__row"))
    val buildSide = bb.select(col(key), col("__b"), lit(1).as("__k1"),
      col(time).as("__t"), lit(0).as("__k3"),
      pay.as("__pay"), lit(null).cast(rowType).as("__row"))
    val carrySide = carry.select(col(key), col("__b"), lit(0).as("__k1"),
      lit(0L).as("__t"), lit(0).as("__k3"),
      col("__carry").as("__pay"), lit(null).cast(rowType).as("__row"))
    // final __pay sort key: among several BUILD rows at the same (key,
    // time), the ascending payload order makes the LAST tied row — the one
    // `last()` resolves to — the lexicographically greatest payload, which
    // is the documented tie contract and what the carry path's
    // `max(struct)` already does; without it the winner is whatever the
    // shuffle happened to sort last (nondeterministic across runs).
    // Probe/carry rows carry null __pay and are untouched (they are
    // already totally ordered by (__k1, __t, __k3)).
    val wIn = Window.partitionBy(col(key), col("__b"))
      .orderBy(col("__k1"), col("__t"), col("__k3"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carrySide.unionByName(buildSide).unionByName(probeSide)
      .withColumn("__res", last(col("__pay"), ignoreNulls = true).over(wIn))
      .filter(col("__row").isNotNull)
      .select(probe.columns.map(c => col(s"__row.$c")) ++
              payload.map(p => col(s"__res.$p").as(p)): _*)
  }

  private val DayMicros = 86400000000L

  /** q76 — purchase attribution by as-of join at FACT×FACT scale: for every
    * event, the same user's most recent purchase at-or-before it. Both
    * sides are the events stream — neither is collectible or
    * broadcast-able at 100 TB; this is [[bucketed]]'s native case (1-day
    * buckets over the 30-day fixture span). */
  def q76AsofBigJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("__t", unix_micros(col("ts")))
    val probe = ev.select(col("event_id"), col("user_id"), col("__t"))
    val build = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("__t"),
              col("event_id").as("purch_id"), col("value").as("purch_value"))
    bucketed(probe, build, "user_id", "__t", Seq("purch_id", "purch_value"),
             DayMicros)
      .select(col("event_id"), col("purch_id"), col("purch_value"))
      .orderBy(col("event_id"))
  }

  val asofBigJoinOracle: String =
    """WITH b AS (SELECT user_id, ts, event_id AS purch_id, value AS purch_value
      |           FROM events WHERE event_type = 'purchase'),
      |p AS (SELECT event_id, user_id, ts FROM events)
      |SELECT p.event_id, b.purch_id, b.purch_value
      |FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts
      |ORDER BY p.event_id""".stripMargin
}
