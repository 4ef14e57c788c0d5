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

  /** Cumulative step schedule over `part` (stand-in for the reward CSV —
    * same shape: ordered key + cumulative decimal-exact sum rendered to
    * double), built with the distributed [[PrefixSum]] so even the step
    * construction carries no single-partition window. */
  def steps(spark: SparkSession, dir: String): DataFrame =
    PrefixSum.withRunningSum(
        Tables.part(spark, dir).select(col("p_partkey"), col("p_retailprice")),
        "p_partkey", Relational.dec(col("p_retailprice")), "cum")
      .select(col("p_partkey").as("k"), Relational.asMoney(col("cum")).as("cum"))

  /** q40 — for each event, the cumulative supply as of its probe key
    * (`lookupLE`): broadcast binary search over the sorted step table. */
  def q40AsofSupply(spark: SparkSession, dir: String): DataFrame = {
    val stepRows = steps(spark, dir).orderBy(col("k")).collect()
    val ks = stepRows.map(_.getLong(0))
    val cums = stepRows.map(_.getDouble(1))
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
}
