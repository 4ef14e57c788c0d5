package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Scale notes: at 100 TB these reads become partitioned table scans; every
  * query in this engine is written so filters/projections push down to the
  * scan (verified via `.explain` — `PushedFilters` / `ReadSchema`). The
  * loaders deliberately return raw un-cached DataFrames: callers decide
  * caching, and Catalyst prunes columns per query.
  */
object Tables {
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects (PARQUET_TYPE_ILLEGAL). We read nanos as a
    * long (`spark.sql.legacy.parquet.nanosAsLong`) and floor-truncate to
    * microsecond precision (Spark's native timestamp resolution). Oracle SQL
    * follows the same convention: only `>=` / `<` predicates at whole-micro
    * boundaries, and `event_id` tiebreaks wherever `ts` orders rows.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      // ts arrives as LongType nanos under the legacy conf; older writers
      // (micros) arrive as TimestampType already — handle both.
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => raw
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
