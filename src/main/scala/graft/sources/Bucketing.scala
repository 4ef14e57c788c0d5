package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — shuffle-free co-located joins (SURVEY §4: the
  * reference relies on B-tree join paths; the Spark analog for repeated
  * large joins on one key is bucketing both sides so the sort-merge join
  * reads pre-shuffled, pre-sorted buckets).
  *
  * The fact/fact join this engine repeats everywhere is
  * `transactions ⋈ blocks` / `lineitem ⋈ orders` on the FK — bucketing
  * both by the key removes the exchange on BOTH sides of every future
  * join at the cost of one write-time shuffle. At 100 TB that's the
  * difference between an nightly-amortized cost and per-query terabyte
  * shuffles.
  */
object Bucketing {

  /** Persist `df` bucketed+sorted by `key` as table `name` (external when
    * a path is given, so tests and jobs control the location instead of
    * the session's static warehouse dir). */
  def writeBucketed(df: DataFrame, name: String, key: String,
                    buckets: Int = 8, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(name)
  }

  /** Join two same-bucketed tables on their bucket key — planner emits a
    * SortMergeJoin with NO shuffle exchange on either side. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
