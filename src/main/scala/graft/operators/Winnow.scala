package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03)
  * over `documents` — the position-aware fingerprinting family's third
  * member, between q37 (global extrema: 2 fingerprints/doc, no locality)
  * and q105 (every window hash: no compression). Winnowing selects, from
  * every window of [[W]] consecutive k-gram hashes, the minimum hash
  * (rightmost on ties), which guarantees:
  *
  *   - any shared token run of length ≥ K + W - 1 produces at least one
  *     IDENTICAL selected fingerprint in both docs (the detection
  *     guarantee q105 gets by keeping everything), while
  *   - expected density is 2/(W+1) of all k-grams (the index is ~2.5×
  *     smaller at W=4) — the standard MOSS/plagiarism-index trade.
  *
  * Cross-engine determinism: the rightmost-min tie rule is encoded
  * STRUCTURALLY — the window minimum is taken over the string key
  * `h || lpad(10^9 - pos)`, whose lexicographic order is exactly
  * (hash ASC, pos DESC): md5 hex is fixed-width lowercase (compares
  * identically everywhere) and `10^9 - pos` is zero-padded to width 10.
  * One `min` per window, no argmax gymnastics, no floats.
  *
  * Scale shape: after the scan, every row is (doc_id, pos, 32-char hash)
  * — the text never travels. The window partitions by doc_id (bounded by
  * doc length, the q106 pattern), the report is partial-aggregated
  * groupBys, and the one fingerprint-keyed exchange carries 32-byte keys.
  * Density × corpus = index size is the design dial: W up ⇒ smaller
  * index, longer minimum detectable match.
  */
object Winnow {

  /** k-gram width in tokens (matches the corpus shingle unit). */
  val K = 3

  /** Winnowing window: guarantee = matches of ≥ K+W-1 = 6 tokens. */
  val W = 4

  /** Position complement base for the (hash ASC, pos DESC) string key. */
  private val PosBase = 1000000000L

  /** Ordered k-gram hashes with 0-based positions (multiplicity kept —
    * winnowing runs over the SEQUENCE, unlike q37's distinct set). */
  private def kgrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsWide(spark, dir)
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= K)
      .select(col("doc_id"), col("source"),
        posexplode(transform(sequence(lit(1), size(col("t")) - lit(K - 1)),
          i => md5(concat_ws(" ", slice(col("t"), i, lit(K))))))
          .as(Seq("pos", "h")))

  /** The selected fingerprint set: distinct (doc, position, hash) chosen
    * by some full window. Exposed for the spec's coverage-guarantee check. */
  private[graft] def selected(spark: SparkSession, dir: String): DataFrame = {
    val keyed = kgrams(spark, dir).withColumn("key",
      concat(col("h"),
        lpad((lit(PosBase) - col("pos")).cast("string"), 10, "0")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(W - 1), 0)
    keyed
      .withColumn("wkey", min(col("key")).over(byDoc))
      .filter(col("pos") >= W - 1) // full windows only (the paper's form)
      .select(col("doc_id"), col("source"),
        substring(col("wkey"), 1, 32).as("fp"),
        (lit(PosBase) - substring(col("wkey"), 33, 10).cast("long"))
          .as("fp_pos"))
      .distinct()
  }

  /** q151 — winnowing report per source: corpus/k-gram mass, selected
    * fingerprint counts, the achieved density (ppm of k-grams kept), and
    * how many distinct fingerprints recur across docs (the cross-doc
    * match signal the index exists to serve). */
  def q151Winnow(spark: SparkSession, dir: String): DataFrame = {
    val kg = kgrams(spark, dir)
    val sel = selected(spark, dir).localCheckpoint()
    val mass = kg.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kgrams"),
           countDistinct(col("doc_id")).as("n_docs_kg"))
    val picks = sel.groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"),
           countDistinct(col("fp")).as("n_distinct_fp"))
    // global doc-frequency of each fingerprint — the dedup/match readout
    val fpDf = sel.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    val shared = sel.join(fpDf, "fp").filter(col("nd") > 1)
      .groupBy(col("source"))
      .agg(countDistinct(col("fp")).as("n_shared_fp"))
    Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(mass, Seq("source"), "left")
      .join(picks, Seq("source"), "left")
      .join(shared, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_docs_kg"), lit(0L)).as("n_docs_kg"),
        coalesce(col("n_kgrams"), lit(0L)).as("n_kgrams"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        when(coalesce(col("n_kgrams"), lit(0L)) > 0,
          expr("n_selected * 1000000L DIV n_kgrams")).otherwise(0L)
          .as("density_ppm"),
        coalesce(col("n_distinct_fp"), lit(0L)).as("n_distinct_fp"),
        coalesce(col("n_shared_fp"), lit(0L)).as("n_shared_fp"))
      .orderBy(col("source"))
  }

  /** toks→kg→keyed→sel CTE block, shared by [[winnowOracle]] and
    * [[winnowPairsOracle]]. */
  private val selCtes: String =
    s"""toks AS (
       |  SELECT doc_id, source, regexp_split_to_array(lower(text), '\\s+') AS t
       |  FROM documents),
       |kg AS (
       |  SELECT doc_id, source, i - 1 AS pos,
       |    md5(array_to_string(t[i:i+${K - 1}], ' ')) AS h
       |  FROM (SELECT doc_id, source, t, unnest(range(1, len(t) - ${K - 2})) AS i
       |        FROM toks WHERE len(t) >= $K)),
       |keyed AS (
       |  SELECT doc_id, source, pos, h,
       |    h || lpad(CAST($PosBase - pos AS VARCHAR), 10, '0') AS key
       |  FROM kg),
       |sel AS (
       |  SELECT DISTINCT doc_id, source, substr(wkey, 1, 32) AS fp,
       |    $PosBase - CAST(substr(wkey, 33, 10) AS BIGINT) AS fp_pos
       |  FROM (SELECT doc_id, source, pos,
       |          min(key) OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN ${W - 1} PRECEDING AND CURRENT ROW) AS wkey
       |        FROM keyed)
       |  WHERE pos >= ${W - 1})""".stripMargin

  val winnowOracle: String =
    s"""WITH $selCtes,
       |mass AS (
       |  SELECT source, count(*) AS n_kgrams,
       |    count(DISTINCT doc_id) AS n_docs_kg
       |  FROM kg GROUP BY source),
       |picks AS (
       |  SELECT source, count(*) AS n_selected,
       |    count(DISTINCT fp) AS n_distinct_fp
       |  FROM sel GROUP BY source),
       |fp_df AS (SELECT fp, count(DISTINCT doc_id) AS nd FROM sel GROUP BY fp),
       |shared AS (
       |  SELECT source, count(DISTINCT s.fp) AS n_shared_fp
       |  FROM sel s JOIN fp_df f ON s.fp = f.fp WHERE f.nd > 1
       |  GROUP BY source)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(coalesce(any_value(m.n_docs_kg), 0) AS BIGINT) AS n_docs_kg,
       |  CAST(coalesce(any_value(m.n_kgrams), 0) AS BIGINT) AS n_kgrams,
       |  CAST(coalesce(any_value(p.n_selected), 0) AS BIGINT) AS n_selected,
       |  CAST(CASE WHEN coalesce(any_value(m.n_kgrams), 0) > 0
       |    THEN any_value(p.n_selected) * 1000000 // any_value(m.n_kgrams)
       |    ELSE 0 END AS BIGINT) AS density_ppm,
       |  CAST(coalesce(any_value(p.n_distinct_fp), 0) AS BIGINT) AS n_distinct_fp,
       |  CAST(coalesce(any_value(s.n_shared_fp), 0) AS BIGINT) AS n_shared_fp
       |FROM documents d
       |LEFT JOIN mass m ON d.source = m.source
       |LEFT JOIN picks p ON d.source = p.source
       |LEFT JOIN shared s ON d.source = s.source
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  // -------------------------------------------------------------------------
  // q158 — winnowing MATCH PAIRS (the MOSS readout)
  // -------------------------------------------------------------------------

  /** Posting-list cap: a fingerprint selected by more than this many docs
    * is a stop-shingle, not evidence of copying — cut BEFORE the pair
    * join (the q92 max-df hatch, here on the winnowing index). */
  val MaxFpDf = 50L

  /** Minimum shared fingerprints to report a pair. */
  val MinShared = 3L

  /** q158 — candidate match pairs from the winnowing index: doc pairs
    * sharing ≥ [[MinShared]] selected fingerprints — exactly how MOSS
    * surfaces plagiarism candidates, and the cheap upstream of the exact
    * verifiers (q82 can re-check any reported pair). The index the join
    * runs on is q151's 2/(W+1)-density selection, so the posting lists
    * are ~2.5× shorter than q105's every-window index; the [[MaxFpDf]]
    * cut bounds the worst posting list BEFORE candidates exist, making
    * worst-case pair volume MaxFpDf²·|fps| — the q92 guarantee shape. */
  def q158WinnowPairs(spark: SparkSession, dir: String): DataFrame = {
    val sel = selected(spark, dir)
      .select(col("doc_id"), col("fp")).distinct().localCheckpoint()
    val df = sel.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd").between(2L, MaxFpDf))
    val posting = sel.join(df.select(col("fp")), "fp")
    posting.select(col("fp"), col("doc_id").as("doc_a"))
      .join(posting.select(col("fp"), col("doc_id").as("doc_b")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val winnowPairsOracle: String =
    s"""WITH $selCtes,
       |sf AS (SELECT DISTINCT doc_id, fp FROM sel),
       |df AS (
       |  SELECT fp FROM (
       |    SELECT fp, count(DISTINCT doc_id) AS nd FROM sf GROUP BY fp)
       |  WHERE nd BETWEEN 2 AND $MaxFpDf),
       |posting AS (SELECT sf.doc_id, sf.fp FROM sf JOIN df USING (fp))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM posting a JOIN posting b
       |  ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY doc_a, doc_b
       |HAVING count(*) >= $MinShared
       |ORDER BY doc_a, doc_b""".stripMargin
}
