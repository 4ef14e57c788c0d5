package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL corpus SINK + SOURCE — the exchange format LLM training corpora
  * actually ship in (one JSON object per line; every public corpus
  * distribution from C4 to Dolma uses it). The engine writes the
  * documents table as JSONL and reads it back with an explicit schema;
  * q207 proves the round trip LOSSLESS by fingerprinting every column of
  * every row through the trip and comparing against a direct-path oracle
  * that never leaves parquet — equality means JSON escaping/quoting/
  * numeric handling preserved the corpus byte-for-byte.
  *
  * Scale: the write is a partition-parallel sink (one shard per task —
  * exactly how a multi-TB corpus exports); the read-back is a scan; the
  * comparison collapses to per-source aggregates at the scan.
  */
object Jsonl {

  /** Canonical full-row fingerprint (shared with the oracle): every
    * column participates, so a dropped/mangled field changes it. */
  private def rowFp(df: DataFrame) =
    md5(concat_ws("|",
      col("doc_id"), col("lang"), col("source"), md5(col("text"))))

  /** q207 — write documents → JSONL (Stores path) → read back → per-source
    * fingerprint envelope. */
  def q207JsonlRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val path = graft.Stores.path(spark, "jsonl_docs_" +
      dir.replaceAll("[^A-Za-z0-9]", "_"))
    docs.write.mode("overwrite").json(path)
    val back = spark.read.schema(docs.schema).json(path)
    back
      .withColumn("fp", rowFp(back))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        countDistinct(col("fp")).as("distinct_rows"),
        min(col("fp")).as("min_fp"),
        max(col("fp")).as("max_fp"))
      .orderBy(col("source"))
  }

  /** The oracle never round-trips: it computes the same envelope straight
    * from parquet, so a lossy JSONL trip cannot match it. */
  val jsonlRoundTripOracle: String =
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
      |  CAST(count(DISTINCT fp) AS BIGINT) AS distinct_rows,
      |  min(fp) AS min_fp, max(fp) AS max_fp
      |FROM (
      |  SELECT source, text,
      |    md5(doc_id || '|' || lang || '|' || source || '|' || md5(text)) AS fp
      |  FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin
}
