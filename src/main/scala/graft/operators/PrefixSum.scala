package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed two-phase prefix sum (running total over a global key order)
  * — the scale-safe replacement for `Window.orderBy` with no PARTITION BY,
  * which funnels the whole relation through one task.
  *
  * Phase plan:
  *   1. bucket rows by fixed-width key ranges (bounds from one tiny min/max
  *      aggregate — deterministic, unlike `repartitionByRange` sampling);
  *   2. per-bucket partial sums — a |buckets|-row aggregate collected to the
  *      driver, turned into exclusive prefix offsets, broadcast back;
  *   3. per-bucket running-sum window + broadcast offset — every bucket
  *      windows in parallel; no single-partition exchange anywhere.
  *
  * All arithmetic is decimal-exact, so the result is bit-identical to the
  * single-task window at any parallelism. Cost: two extra small jobs; at
  * 100 TB the alternative is a one-task sort of the table, so this is the
  * only shape that survives (the reference's analog is a 1,435-row driver
  * loop — chainweb-data exec/Chainweb/Coins.hs:152-158 — which stays valid
  * for dimensions; this operator covers fact-sized inputs too).
  */
object PrefixSum {

  /** Adds `outCol` = running sum of `value` in `keyCol` order. `keyCol` must
    * be integral and unique per row; `value` must be decimal with scale ≤ 6
    * (exactness contract shared with the DuckDB oracles). */
  def withRunningSum(df: DataFrame, keyCol: String, value: Column,
                     outCol: String, numBuckets: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val sumType = DecimalType(38, 6)
    val stats = df.agg(min(col(keyCol)).cast("long"), max(col(keyCol)).cast("long"))
      .collect().head
    if (stats.isNullAt(0))
      return df.withColumn(outCol, lit(null).cast(sumType))
    val (mn, mx) = (stats.getLong(0), stats.getLong(1))
    val width = math.max(1L, (mx - mn) / numBuckets + 1)

    val bucketed = df
      // `div`, not `/`: Spark's `/` is double division, which would
      // mis-bucket key deltas beyond 2^53 at full key-space scale.
      .withColumn("__bucket",
        expr(s"(CAST(`$keyCol` AS BIGINT) - ${mn}L) DIV ${width}L"))
      .withColumn("__v", value.cast(sumType))

    // Exclusive prefix offsets over the per-bucket partials (driver-side:
    // |buckets| rows, the same dimension-scale control loop the reference
    // runs for its reward schedule).
    val partials = bucketed.groupBy(col("__bucket"))
      .agg(sum(col("__v")).cast(sumType).as("__bsum"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).sortBy(_._1)
    var acc = java.math.BigDecimal.ZERO.setScale(6)
    val offsets = partials.map { case (b, s) =>
      val o = acc; acc = acc.add(s); Row(b, o)
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq, 1),
      StructType(Seq(StructField("__bucket", LongType, nullable = false),
                     StructField("__off", sumType))))

    val w = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offDf), Seq("__bucket"))
      .withColumn(outCol, (col("__off") + sum(col("__v")).over(w)).cast(sumType))
      .drop("__bucket", "__v", "__off")
  }

  /** Adds `outCol` = global 1-based rank (dense row numbering) in `keyCol`
    * order, plus the total row count — the prefix-sum-of-ones special case,
    * done in long arithmetic with the count folded into the bounds job:
    *   1. one aggregate for (min, max, count);
    *   2. per-bucket counts → driver exclusive offsets → broadcast;
    *   3. per-bucket `row_number` + offset.
    * Same no-single-partition guarantee as [[withRunningSum]], one fewer
    * control job and no decimal codec in the hot path. `keyCol` must be
    * integral and unique per row. */
  def globalRank(df: DataFrame, keyCol: String, outCol: String,
                 numBuckets: Int = 64): (DataFrame, Long) = {
    val spark = df.sparkSession
    val stats = df.agg(min(col(keyCol)).cast("long"), max(col(keyCol)).cast("long"),
                       count(lit(1)))
      .collect().head
    if (stats.isNullAt(0))
      return (df.withColumn(outCol, lit(null).cast(LongType)), 0L)
    val (mn, mx, n) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val width = math.max(1L, (mx - mn) / numBuckets + 1)
    val bucketed = df.withColumn("__bucket",
      expr(s"(CAST(`$keyCol` AS BIGINT) - ${mn}L) DIV ${width}L"))
    val partials = bucketed.groupBy(col("__bucket")).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = partials.map { case (b, c) => val o = acc; acc += c; Row(b, o) }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq, 1),
      StructType(Seq(StructField("__bucket", LongType, nullable = false),
                     StructField("__off", LongType, nullable = false))))
    val w = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
    val ranked = bucketed
      .join(broadcast(offDf), Seq("__bucket"))
      .withColumn(outCol, col("__off") + row_number().over(w).cast("long"))
      .drop("__bucket", "__off")
    (ranked, n)
  }

  /** PARTITIONED two-phase rank: `outCol` = 1-based rank of each row
    * within its `partCol` group, ordered by `orderCols` — the scale-safe
    * replacement for `Window.partitionBy(part).orderBy(...)` when a single
    * partition value can be fact-sized (one source holding most of a
    * 100 TB corpus would otherwise funnel through one task).
    *
    * Caller supplies `bucketCol`: an integral 0..B−1 column derived from
    * the leading order key (so bucket boundaries respect the order).
    * Control state is |parts|·B rows — both bounded dimensions. Window
    * partitions are (part, bucket): each bounded to ~1/B of its part.
    * `orderCols` must be a total order within (part, bucket) for the
    * result to be deterministic. */
  def partitionedRank(df: DataFrame, partCol: String, bucketCol: String,
                      orderCols: Seq[String], outCol: String): DataFrame = {
    val spark = df.sparkSession
    val partials = df.groupBy(col(partCol), col(bucketCol))
      .agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val offsets = partials.toSeq.flatMap { case (p, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (_, b, c) =>
        val o = acc; acc += c; Row(p, b, o)
      }
    }
    val pField = df.schema(partCol)
    val bField = df.schema(bucketCol)
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets, 1),
      StructType(Seq(StructField(partCol, pField.dataType, pField.nullable),
                     StructField(bucketCol, LongType, nullable = false),
                     StructField("__off", LongType, nullable = false))))
    val w = Window.partitionBy(col(partCol), col(bucketCol))
      .orderBy(orderCols.map(col): _*)
    df.join(broadcast(offDf), Seq(partCol, bucketCol))
      .withColumn(outCol, col("__off") + row_number().over(w).cast("long"))
      .drop("__off")
  }

  /** Global 1-based rank by an integral score column (desc unless `asc`),
    * ties broken by `doc_id` — [[partitionedRank]] specialization with a
    * score-derived 256-way bucket, so no naive global-order window is
    * ever planned. `df` must carry a `doc_id` column. */
  def globalRankBy(df: DataFrame, scoreCol: String, asc: Boolean,
                   outCol: String): DataFrame = {
    val keyed = df
      .withColumn("__ord",
        (if (asc) col(scoreCol) else -col(scoreCol)).cast("long"))
      .withColumn("__g", lit(1L))
    val stats = keyed.agg(min(col("__ord")), max(col("__ord"))).collect().head
    if (stats.isNullAt(0))
      return df.withColumn(outCol, lit(null).cast(LongType))
    val (mn, mx) = (stats.getLong(0), stats.getLong(1))
    val width = math.max(1L, (mx - mn) / 256 + 1)
    val bucketed = keyed.withColumn("__b",
      expr(s"(__ord - ${mn}L) DIV ${width}L"))
    partitionedRank(bucketed, "__g", "__b", Seq("__ord", "doc_id"), outCol)
      .drop("__ord", "__g", "__b")
  }
}
