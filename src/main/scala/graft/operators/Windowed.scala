package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time tumbling windows — the batch face of the streaming
  * windowed aggregation ([[graft.streaming.Listen.windowedEventCounts]]).
  * Same grouping (1-day tumbling window × event_type), so a historical
  * backfill and the live stream produce union-compatible rows (SURVEY §2.9
  * T2: the reference handles lateness structurally, batch repair + live
  * append — this is the batch half).
  *
  * Scale: pre-aggregation happens map-side per partition; the shuffle
  * carries only |windows × types| rows. Day-window grouping keys are
  * derivable from partition values when the table is date-partitioned, so
  * at 100 TB this can run partition-local.
  */
object Windowed {

  /** q38 — tumbling 1-day windows over event time: count + exact-decimal
    * value sum per event type. */
  def q38TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           Relational.asMoney(sum(Relational.dec(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  val tumblingOracle: String =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type,
      |  count(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q54 — trailing 24h per-user aggregates via a RANGE frame (value-based
    * bounds — the only frame kind the reference never used; sliding
    * exposure/rate features in a training pipeline are exactly this
    * shape). One shuffle on user_id; frames evaluate on the sorted
    * per-user stream. */
  def q54RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-86400000000L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum",
        Relational.asMoney(sum(Relational.dec(col("value"))).over(w)))
      .select(col("user_id"), col("event_id"), col("trail_n"), col("trail_sum"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val rangeFrameOracle: String =
    """SELECT user_id, event_id,
      |  count(*) OVER w AS trail_n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DECIMAL(38,4)) AS DOUBLE) AS trail_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  val langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** q55 — pivot: language columns per source (corpus audit matrix). */
  def q55PivotCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .pivot("lang", langs)
      .count()
      .na.fill(0L)
      .orderBy(col("source"))

  val pivotOracle: String = {
    val cols = langs.map(l =>
      s"CAST(sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS \"$l\"")
      .mkString(",\n  ")
    s"SELECT source,\n  $cols\nFROM documents GROUP BY source ORDER BY source"
  }
}
