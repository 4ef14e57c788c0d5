package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Release-over-release corpus DIFF — the data-versioning audit every
  * dataset release pipeline runs before shipping (the "what changed since
  * v1" datasheet row; the content-addressed diff DVC/Hugging Face dataset
  * viewers surface). Two releases are compared by PRIMARY KEY + CONTENT
  * HASH: a doc present only in the new release is `added`, only in the
  * old `removed`, in both with different md5 `changed`, else `unchanged`.
  *
  * Scale shape: each release collapses to a narrow (doc_id, source,
  * 32-char md5) relation AT THE SCAN — text never enters the join — and
  * the diff is one keyed full-outer join + a per-(source, status) partial
  * aggregate. No window, no broadcast needed (both sides are corpus-sized
  * and co-partition on the join key).
  *
  * Releases are carved deterministically from `documents` (the corpus has
  * no release column): the PREVIOUS release lacks the doc_id%16==0 docs
  * (they are `added` in the current one), the CURRENT release drops
  * doc_id%16==5 (`removed`) and appends a revision marker to doc_id%8==3
  * (`changed`); 16∤5−8·k keeps the classes disjoint by construction.
  */
object Releases {

  /** Revision marker appended to changed docs (shared with the oracle). */
  val RevTail = " [rev2]"

  private def releases(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val prev = d.filter(pmod(col("doc_id"), lit(16L)) =!= 0L)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    val curr = d.filter(pmod(col("doc_id"), lit(16L)) =!= 5L)
      .select(col("doc_id"), col("source"),
        md5(when(pmod(col("doc_id"), lit(8L)) === 3L,
                 concat(col("text"), lit(RevTail)))
              .otherwise(col("text"))).as("h"))
    (prev, curr)
  }

  /** q185 — per (source, status) doc counts of the release diff. */
  def q185ReleaseDiff(spark: SparkSession, dir: String): DataFrame = {
    val (prev, curr) = releases(spark, dir)
    prev.select(col("doc_id"), col("source").as("src_p"), col("h").as("h_p"))
      .join(curr.select(col("doc_id"), col("source").as("src_c"),
                        col("h").as("h_c")),
            Seq("doc_id"), "full_outer")
      .select(coalesce(col("src_p"), col("src_c")).as("source"),
        when(col("h_p").isNull, "added")
          .when(col("h_c").isNull, "removed")
          .when(col("h_p") =!= col("h_c"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("source"), col("status"))
  }

  val releaseDiffOracle: String =
    s"""WITH prev AS (
       |  SELECT doc_id, source, md5(text) AS h
       |  FROM documents WHERE doc_id % 16 <> 0),
       |curr AS (
       |  SELECT doc_id, source,
       |    md5(CASE WHEN doc_id % 8 = 3 THEN text || '$RevTail' ELSE text END) AS h
       |  FROM documents WHERE doc_id % 16 <> 5)
       |SELECT coalesce(p.source, c.source) AS source,
       |  CASE WHEN p.h IS NULL THEN 'added'
       |       WHEN c.h IS NULL THEN 'removed'
       |       WHEN p.h <> c.h THEN 'changed'
       |       ELSE 'unchanged' END AS status,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id
       |GROUP BY 1, 2 ORDER BY source, status""".stripMargin

  // -------------------------------------------------------------------------
  // q195 — release DISTRIBUTION drift (the PSI dashboard readout, log-free):
  // token-length decile histograms of the two releases side by side, with
  // exact integer per-bucket shares and absolute share deltas in ppm. PSI
  // weights the same deltas by a log ratio; the L1 form ranks drift
  // identically per bucket and is bit-exact across engines. Catches what
  // q185's row diff can't: a release whose rows mostly "changed" but whose
  // DISTRIBUTION stayed put (harmless) vs one where a small row delta
  // moved a whole decile (retrain trigger).
  //
  // Scale: each release collapses to a ≤10-row histogram at the scan;
  // everything after is arithmetic on those 10 rows.
  // -------------------------------------------------------------------------

  /** q195 — per decile-bucket: release doc counts, shares, |Δshare| ppm. */
  def q195ReleaseDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val prevLen = d.filter(pmod(col("doc_id"), lit(16L)) =!= 0L)
      .select(size(TextOps.tokens(col("text"))).cast("long").as("n"))
    val currLen = d.filter(pmod(col("doc_id"), lit(16L)) =!= 5L)
      .select(size(TextOps.tokens(
        when(pmod(col("doc_id"), lit(8L)) === 3L,
             concat(col("text"), lit(RevTail))).otherwise(col("text"))))
        .cast("long").as("n"))
    def hist(lens: DataFrame, cnt: String): DataFrame =
      lens.select(least(lit(9L), expr("n DIV 10")).cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(cnt))
    val p = hist(prevLen, "n_prev")
    val c = hist(currLen, "n_curr")
    p.join(c, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_curr"), lit(0L)).as("n_curr"))
      .crossJoin( // 1-row control totals
        prevLen.agg(count(lit(1)).as("tot_prev"))
          .crossJoin(currLen.agg(count(lit(1)).as("tot_curr"))))
      .select(col("bucket"), col("n_prev"), col("n_curr"),
        expr("(1000000 * n_prev) DIV tot_prev").as("share_prev_ppm"),
        expr("(1000000 * n_curr) DIV tot_curr").as("share_curr_ppm"),
        abs(expr("(1000000 * n_prev) DIV tot_prev") -
            expr("(1000000 * n_curr) DIV tot_curr")).as("drift_ppm"))
      .orderBy(col("bucket"))
  }

  val releaseDriftOracle: String =
    s"""WITH prev AS (
       |  SELECT len(regexp_split_to_array(lower(text), '\\s+')) AS n
       |  FROM documents WHERE doc_id % 16 <> 0),
       |curr AS (
       |  SELECT len(regexp_split_to_array(lower(
       |    CASE WHEN doc_id % 8 = 3 THEN text || '$RevTail' ELSE text END), '\\s+')) AS n
       |  FROM documents WHERE doc_id % 16 <> 5),
       |ph AS (SELECT least(9, n // 10) AS bucket, CAST(count(*) AS BIGINT) AS n_prev
       |       FROM prev GROUP BY 1),
       |ch AS (SELECT least(9, n // 10) AS bucket, CAST(count(*) AS BIGINT) AS n_curr
       |       FROM curr GROUP BY 1),
       |tot AS (SELECT (SELECT count(*) FROM prev) AS tot_prev,
       |               (SELECT count(*) FROM curr) AS tot_curr)
       |SELECT CAST(coalesce(ph.bucket, ch.bucket) AS BIGINT) AS bucket,
       |  CAST(coalesce(n_prev, 0) AS BIGINT) AS n_prev,
       |  CAST(coalesce(n_curr, 0) AS BIGINT) AS n_curr,
       |  (1000000 * CAST(coalesce(n_prev, 0) AS BIGINT)) // tot_prev AS share_prev_ppm,
       |  (1000000 * CAST(coalesce(n_curr, 0) AS BIGINT)) // tot_curr AS share_curr_ppm,
       |  abs((1000000 * CAST(coalesce(n_prev, 0) AS BIGINT)) // tot_prev -
       |      (1000000 * CAST(coalesce(n_curr, 0) AS BIGINT)) // tot_curr) AS drift_ppm
       |FROM ph FULL OUTER JOIN ch ON ph.bucket = ch.bucket
       |CROSS JOIN tot
       |ORDER BY bucket""".stripMargin
}
