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
}
