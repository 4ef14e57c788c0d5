package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical stateful-stream operator the
  * reference never needed (SURVEY §2.9 T6) but a training-data pipeline
  * does (grouping user/document activity into episodes). Two faces, one
  * definition (a new session starts after a > 8h silence):
  *
  *   - batch (q41): lag + running-sum windows — one shuffle on user_id,
  *     per-user streams sorted within partitions; scale-safe because
  *     sessions never cross the partition key.
  *   - streaming: `flatMapGroupsWithState` over the same key
  *     ([[graft.streaming.Sessions]]), emitting a session row the moment
  *     the closing gap is observed — state is one open session per key,
  *     bytes not history.
  */
object Sessionize {

  val GapSeconds = 28800L // 8h — matches the synthetic data's activity scale

  /** q41 — sessions per user: id by cumulative new-session flags. */
  def q41Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(order)
    val isNew = when(prev.isNull ||
      (unix_micros(col("ts")) - unix_micros(prev)) > GapSeconds * 1000000L, 1L)
      .otherwise(0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("session_seq", sum(isNew).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** q62 — the same sessions via Spark's BUILT-IN `session_window`
    * (merging windows in one aggregation, the shape Structured Streaming
    * uses natively). The DuckDB oracle is the MANUAL lag/cumsum
    * construction with a `>=` boundary — `session_window`'s window is
    * `[start, start+gap)`, so an event at EXACTLY gap distance starts a new
    * session; the oracle encodes that same strict boundary, making the two
    * definitions agree on every input (not just gap-tie-free data). q41
    * keeps the `>` boundary on both sides — the two queries pin down both
    * conventions. */
  def q62SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), s"$GapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              col("session_window.start").as("session_start"),
              col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  val sessionWindowOracle: String =
    s"""WITH g AS (
       |  SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w >= INTERVAL $GapSeconds SECOND
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, ts,
       |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM g)
       |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
       |  count(*) AS n_events
       |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  val sessionizeOracle: String =
    s"""WITH g AS (
       |  SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w > INTERVAL $GapSeconds SECOND
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, ts,
       |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS session_seq
       |  FROM g)
       |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       |  count(*) AS n_events,
       |  CAST(min(ts) AS TIMESTAMP) AS session_start,
       |  CAST(max(ts) AS TIMESTAMP) AS session_end
       |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
