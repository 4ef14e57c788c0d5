package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed interval/range join ("points in windows") — the attribution /
  * enrichment shape analytics pipelines run constantly: events within
  * [t0, t0+Δ) of an anchor, readings inside a maintenance window, clicks
  * after a signup. Spark has no range-join operator; the naive inequality
  * join plans as BroadcastNestedLoop (or worse, a cartesian per key) and
  * dies when both sides are fact-scale.
  *
  * Scale shape — bucket expansion: each interval explodes to the time
  * buckets it covers (`(end-1) DIV W - start DIV W + 1` rows — ≤ 2 when
  * intervals are no wider than the bucket), each point maps to exactly ONE
  * bucket, and the join is a plain equi-join on `(key, bucket)` with the
  * exact containment predicate as a post-filter. Every exchange is keyed
  * `(key, bucket)`; fan-out is bounded by interval-width/bucket-width (the
  * skew/cost knob), and a point is never duplicated, so no dedup pass is
  * needed afterwards.
  */
object RangeJoin {

  /** Count `points` rows with `points.tCol ∈ [intervals.startCol,
    * intervals.endCol)` on the same `key`, appended to each interval row as
    * `countAlias` (0 when none — LEFT semantics). `idCol` must uniquely
    * identify interval rows; all time columns are LONGs (epoch micros in
    * q77). */
  def countInInterval(intervals: DataFrame, points: DataFrame, key: String,
                      idCol: String, startCol: String, endCol: String,
                      tCol: String, bucketWidth: Long,
                      countAlias: String): DataFrame = {
    val exploded = intervals
      .withColumn("__bkt", explode(sequence(
        expr(s"$startCol DIV ${bucketWidth}L"),
        expr(s"($endCol - 1L) DIV ${bucketWidth}L"))))
      .select(col(key), col("__bkt"), col(idCol), col(startCol), col(endCol))
    val pts = points
      .withColumn("__bkt", expr(s"$tCol DIV ${bucketWidth}L"))
    val counts = exploded.join(pts, Seq(key, "__bkt"))
      .filter(col(tCol) >= col(startCol) && col(tCol) < col(endCol))
      .groupBy(col(idCol)).agg(count(lit(1)).as(countAlias))
    intervals.join(counts, Seq(idCol), "left")
      .withColumn(countAlias, coalesce(col(countAlias), lit(0L)))
  }

  private val HourMicros = 3600000000L

  /** q77 — attribution window at FACT×FACT scale: for every signup, how
    * many clicks the same user made within the following hour. Both sides
    * are the events stream; bucket width = the window width, so each anchor
    * explodes to at most 2 buckets. */
  def q77AttributionWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("__t", unix_micros(col("ts")))
    val anchors = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("anchor_id"), col("user_id"),
              col("__t").as("__start"), (col("__t") + HourMicros).as("__end"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("__t"))
    countInInterval(anchors, clicks, "user_id", "anchor_id",
        "__start", "__end", "__t", HourMicros, "n_follow")
      .select(col("anchor_id"), col("n_follow"))
      .orderBy(col("anchor_id"))
  }

  val attributionOracle: String =
    """SELECT a.event_id AS anchor_id, count(c.event_id) AS n_follow
      |FROM events a LEFT JOIN events c
      |  ON c.user_id = a.user_id AND c.event_type = 'click'
      | AND c.ts >= a.ts AND c.ts < a.ts + INTERVAL 1 HOUR
      |WHERE a.event_type = 'signup'
      |GROUP BY a.event_id ORDER BY anchor_id""".stripMargin
}
