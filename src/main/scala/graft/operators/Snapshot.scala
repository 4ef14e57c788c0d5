package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus SNAPSHOT DIFF — the incremental-ingest primitive a recurring
  * crawl pipeline runs between releases: classify every document as
  * added / removed / changed / unchanged between two corpus snapshots.
  *
  * Spark-first shape: each side is projected to (key, fingerprint)
  * BEFORE the join — only a key and a 32-char hash ever enter the
  * exchange, never the document text — then ONE co-partitioned
  * full-outer sort-merge join on the key classifies everything. At
  * 100 TB both sides hash-partition by doc_id; the fingerprint
  * projection pushes column pruning into the parquet scan (text is read
  * only to hash, doc text never shuffles), and AQE absorbs the usual
  * size asymmetry (yesterday's corpus ≫ today's delta). The same
  * operator with `cur` as the small side becomes a broadcast probe.
  *
  * The reference has no snapshot story (it re-ingests forward-only);
  * this is training-data lifecycle machinery: release diffs drive
  * incremental re-dedup (q81's batch-vs-corpus shape), re-embedding of
  * changed docs only, and audit trails of what entered/left a release.
  */
object Snapshot {

  /** Classify rows of `cur` against `prev` by `key`, comparing the
    * given fingerprint column (computed on each side). Output: one row
    * per key present in either side, with `status` in
    * {added, removed, changed, unchanged}. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame,
                   key: String, fingerprint: Column): DataFrame = {
    val p = prev.select(col(key).as("k"), fingerprint.as("fp_prev"))
    val c = cur.select(col(key).as("k"), fingerprint.as("fp_cur"))
    p.join(c, Seq("k"), "full_outer")
      .select(col("k").as(key),
        when(col("fp_prev").isNull, lit("added"))
          .when(col("fp_cur").isNull, lit("removed"))
          .when(col("fp_prev") =!= col("fp_cur"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** q120 — snapshot diff over two DETERMINISTIC synthetic releases of
    * the documents table (the fixture has one snapshot, so the two
    * releases are carved arithmetically — every membership/edit decision
    * is a doc_id modulus both engines spell identically):
    *   prev = docs with doc_id % 11 ≠ 0 (the % 11 == 0 docs are "new
    *          since the last crawl");
    *   cur  = docs with doc_id % 7 ≠ 0 (the % 7 == 0 docs "fell out"),
    *          with text revised (suffix " rev2") when doc_id % 5 == 0.
    * Fingerprint = md5(text): equality ⟺ text equality in both engines,
    * and only the 32-char hash crosses the exchange. */
  def q120SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val prev = docs.filter(col("doc_id") % 11 =!= 0)
    val cur = docs.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
    snapshotDiff(prev, cur, "doc_id", md5(col("text")))
      .orderBy(col("doc_id"))
  }

  val snapshotDiffOracle: String =
    """WITH prev AS (
      |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 11 <> 0),
      |cur AS (
      |  SELECT doc_id,
      |         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END) AS fp
      |  FROM documents WHERE doc_id % 7 <> 0)
      |SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
      |  CASE WHEN p.doc_id IS NULL THEN 'added'
      |       WHEN c.doc_id IS NULL THEN 'removed'
      |       WHEN p.fp <> c.fp THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
      |ORDER BY doc_id""".stripMargin
}
