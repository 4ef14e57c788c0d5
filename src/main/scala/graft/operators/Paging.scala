package graft.operators

import graft.Tables
import graft.plans.BoundedScan
import graft.plans.BoundedScan.CursorSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable faces of the bounded-scan engine (SURVEY §2.5 W2/W3):
  * each phase run once with fixed budgets over the events table, so the
  * driver's DuckDB compare exercises the exact window/budget semantics the
  * serving loop relies on. */
object Paging {

  private val spec = CursorSpec(Seq("user_id" -> true, "event_id" -> true))

  /** W2 — offset→cursor conversion within a 200-row scan budget. */
  def q25BoundedOffset(spark: SparkSession, dir: String): DataFrame =
    BoundedScan.offsetPhase(
        Tables.events(spark, dir).select(col("user_id"), col("event_id"), col("event_type")),
        spec, col("event_type") === "click", scanLimit = 200, offset = 30)
      .select(col("user_id"), col("event_id"),
              col("scan_num").cast("long").as("scan_num"), col("found_num"))

  /** W3 — up-to-10 matches within a 200-row scan budget + resume sentinel. */
  def q26BoundedLimit(spark: SparkSession, dir: String): DataFrame =
    BoundedScan.limitPhase(
        Tables.events(spark, dir).select(col("user_id"), col("event_id"), col("event_type")),
        spec, col("event_type") === "click", scanLimit = 200, resultLimit = 10)
      .select(col("user_id"), col("event_id"), col("match"),
              col("scan_num").cast("long").as("scan_num"))
}
