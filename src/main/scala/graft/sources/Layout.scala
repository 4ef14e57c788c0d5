package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table layout — the Spark replacement for the reference's
  * B-tree access paths (SURVEY §4: every index in chainweb-data's
  * db-schema/init.sql:41-51,112-118,137-144 becomes a clustering choice).
  *
  * Strategy per access path:
  *   - `(chainid, height DESC)` scans → hive-partition by
  *     `(chainid, height_bucket)`; height-range predicates prune whole
  *     directories before any file is opened (PartitionFilters), and the
  *     residual `height` predicate prunes row groups via parquet stats.
  *   - `requestkey` point lookups → sort within files by requestkey so
  *     min/max stats + (on lakehouse formats) bloom filters skip files.
  *   - `from_acct/to_acct` history → the reference keeps two indexes; the
  *     columnar analog is sorting the transfers table by
  *     `(from_acct, height)` — the U1 union-of-two-scans then prunes one
  *     side per predicate.
  *
  * Bucket width trades directory count against pruning granularity: at
  * ~2s/block and 20 chains, 100k heights ≈ 2.3 days per bucket per chain;
  * 100 TB ⇒ a few thousand partitions — well inside metastore comfort.
  */
object Layout {

  val HeightBucketWidth = 100000L

  def heightBucket(height: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (height / HeightBucketWidth).cast("long")

  /** Write a block-shaped table clustered for the height access path. */
  def writeHeightClustered(df: DataFrame, path: String,
                           chainCol: String = "chainid",
                           heightCol: String = "height"): Unit =
    df.withColumn("height_bucket", heightBucket(col(heightCol)))
      .repartition(col(chainCol), col("height_bucket"))
      .sortWithinPartitions(col(heightCol).desc)
      .write.mode("overwrite")
      .partitionBy(chainCol, "height_bucket")
      .parquet(path)

  /** Read with partition pruning: height/chain predicates that reference
    * the partition columns never touch non-matching directories. */
  def readHeightRange(spark: SparkSession, path: String,
                      chain: Long, lo: Long, hi: Long,
                      chainCol: String = "chainid",
                      heightCol: String = "height"): DataFrame =
    spark.read.parquet(path)
      .filter(col(chainCol) === chain &&
              col("height_bucket").between(lo / HeightBucketWidth, hi / HeightBucketWidth) &&
              col(heightCol).between(lo, hi))
}
