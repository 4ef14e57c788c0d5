package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexicon-based content filtering and the classifier/score audits that
  * sit on top of it — three standard curation stages the corpus-side
  * library had not yet covered:
  *
  *   - q166: the C4 "bad-word" document filter (Raffel et al. JMLR'20
  *     §2.2 drop any page containing a blocklisted word) as a token-level
  *     dictionary match;
  *   - q167: an exact tie-aware Mann–Whitney AUC audit of the q35
  *     quality score against the lexicon label (the "does my cheap score
  *     actually separate the class I care about?" calibration readout);
  *   - q168: a learned hashed-feature linear classifier (the fastText /
  *     hashing-trick shape: Joulin et al. 2016; Weinberger et al.
  *     ICML'09) trained on one half of the corpus and evaluated on the
  *     other — the quality-classifier inference primitive CCNet/LLaMA
  *     pipelines run at scale.
  *
  * Like [[Pii]]/[[UrlOps]], the synthetic corpus contains no blocklisted
  * terms, so [[lexTail]] injects deterministic doc_id-derived markers
  * (moduli 7/11 — coprime to the doc_id→source stride of 20, so every
  * source sees positives in both split halves), recomputed identically
  * by the oracle; Round5dSpec pins zero hits on the raw corpus. The
  * lexicon itself is ONE shared Scala literal rendered into both
  * engines, and includes never-injected decoys (a detector that can't
  * stay silent on them would flag false positives).
  *
  * Determinism rules (the round-5 discipline): token-level exact match
  * (no regex), integer-ppm arithmetic everywhere (Spark `DIV` and DuckDB
  * `//` both truncate toward zero — machine-checked in Round5dSpec), the
  * portable md5-top-8-hex hash ([[Sketches.h32]]) for feature ids, and
  * sums-not-averages in q168's output so no division result depends on a
  * sign convention.
  *
  * Scale: q166 is a pure codegen'd row map (the dictionary is an IN-list
  * literal; real blocklists at ~1e3 terms still inline, ~1e6 terms become
  * the q148 broadcast-join shape) plus partial-aggregated groupBys. q167
  * collapses the corpus to one row per (source, distinct score) BEFORE
  * its window — the window partitions by source over that bounded
  * dimension, never over docs. q168's feature space is capped at
  * [[HashDim]] rows BY CONSTRUCTION (the hashing trick's point), so the
  * learned model is always a broadcast dimension regardless of corpus
  * size; the corpus-side relation is narrow (doc_id, fid) pairs.
  */
object Lexicon {

  /** The shared blocklist literal: six injectable terms + three decoys
    * that [[lexTail]] never emits (zero-hit teeth). */
  val lexicon: Seq[String] =
    (0 until 3).map(i => s"zzterm$i") ++
    (0 until 3).map(i => s"qqterm$i") ++
    Seq("zzterm7", "qqterm9", "xxneverterm")

  /** Deterministic marker tail: a zzterm on doc_id%7==2, a qqterm on
    * doc_id%11==4 (both coprime to the source stride 20; positive rate
    * ~23%, never 0% or 100% within a source or split half). */
  def lexTail(d: Column): Column = {
    def s(c: Column) = c.cast("string")
    concat(
      when(d % 7 === 2, concat(lit(" zzterm"), s(d % 3))).otherwise(""),
      when(d % 11 === 4, concat(lit(" qqterm"), s(d % 3))).otherwise(""))
  }

  /** The SQL twin of [[lexTail]]. */
  // one line: this string is interpolated into stripMargin'd oracles, where
  // a leading `||` would be eaten as a margin character
  val lexTailSql: String =
    "CASE WHEN doc_id % 7 = 2 THEN ' zzterm' || (doc_id % 3) ELSE '' END" +
    " || CASE WHEN doc_id % 11 = 4 THEN ' qqterm' || (doc_id % 3) ELSE '' END"

  /** documents + marker tail. */
  def lexTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      concat(col("text"), lexTail(col("doc_id"))).as("lex_text"))

  private def inListSql: String = lexicon.map(t => s"'$t'").mkString(", ")

  /** Shared oracle front: lexed text + token array + hit list + label. */
  private def labSql: String =
    s"""lexed AS (
       |  SELECT doc_id, source, text || $lexTailSql AS lex_text
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, source,
       |    regexp_split_to_array(lower(lex_text), '\\s+') AS t
       |  FROM lexed),
       |lab AS (
       |  SELECT doc_id, source, t,
       |    list_filter(t, x -> x IN ($inListSql)) AS hits,
       |    CASE WHEN len(list_filter(t, x -> x IN ($inListSql))) > 0
       |         THEN 1 ELSE 0 END AS label
       |  FROM tok)""".stripMargin

  /** Spark twin of [[labSql]]'s per-doc columns. */
  private[operators] def labTable(spark: SparkSession, dir: String): DataFrame = {
    val t = TextOps.tokens(col("lex_text"))
    lexTable(spark, dir)
      .withColumn("t", t)
      .withColumn("hits", filter(col("t"), x => x.isInCollection(lexicon)))
      .withColumn("label",
        when(size(col("hits")) > 0, 1L).otherwise(0L))
  }

  // -------------------------------------------------------------------------
  // q166 — the C4 §2.2 bad-word document filter
  // -------------------------------------------------------------------------

  /** q166 — per-source lexicon triage: docs flagged (C4 drops these),
    * total hits, distinct terms seen, survivors. The match is a pure
    * codegen'd array filter against the IN-list literal — no join, no
    * explode on the doc path; only the (rare) hits explode for the
    * distinct-term readout. */
  def q166LexiconFilter(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = labTable(spark, dir)
      .select(col("source"), col("doc_id"), col("hits"),
        size(col("hits")).cast("long").as("n_hits"))
    val bySrc = perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("docs_flagged"),
      sum(col("n_hits")).as("total_hits"))
    val terms = perDoc.select(col("source"), explode(col("hits")).as("term"))
      .groupBy(col("source"))
      .agg(countDistinct(col("term")).as("n_terms_seen"))
    bySrc.join(terms, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("docs_flagged"),
        col("total_hits"),
        (col("n_docs") - col("docs_flagged")).as("docs_surviving"),
        coalesce(col("n_terms_seen"), lit(0L)).as("n_terms_seen"))
      .orderBy(col("source"))
  }

  val lexiconFilterOracle: String =
    s"""WITH $labSql,
       |bysrc AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN len(hits) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
       |    CAST(sum(len(hits)) AS BIGINT) AS total_hits
       |  FROM lab GROUP BY source),
       |terms AS (
       |  SELECT source, CAST(count(DISTINCT term) AS BIGINT) AS n_terms_seen
       |  FROM (SELECT source, unnest(hits) AS term FROM lab)
       |  GROUP BY source)
       |SELECT b.source, n_docs, docs_flagged, total_hits,
       |  n_docs - docs_flagged AS docs_surviving,
       |  coalesce(n_terms_seen, 0) AS n_terms_seen
       |FROM bysrc b LEFT JOIN terms USING (source)
       |ORDER BY source""".stripMargin

  // -------------------------------------------------------------------------
  // q167 — exact Mann–Whitney AUC of the q35 quality score vs the label
  // -------------------------------------------------------------------------

  /** q167 — tie-aware rank-sum AUC per source, entirely in integers: the
    * corpus collapses to one row per (source, distinct q_ppm), the
    * tie-group average rank is kept doubled (2·cum_before + n + 1) so it
    * stays integral, and U2 = 2·U so AUC = U2 / (2·n_pos·n_neg) exactly.
    * auc_ppm uses truncating integer division (identical in both
    * engines). BIGINT headroom: U2 ≤ 2·n_pos·n_neg, so auc_ppm's
    * numerator overflows only past ~1e6 docs/source·1e6 — production
    * would route through DECIMAL(38,0) at that point. */
  def q167QualityAuc(spark: SparkSession, dir: String): DataFrame = {
    val qual = TextOps.q35QualityScore(spark, dir)
      .select(col("doc_id"),
        expr("CAST(round(quality * 1000000.0) AS BIGINT)").as("q_ppm"))
    val lab = labTable(spark, dir).select(col("doc_id"), col("source"), col("label"))
    val byScore = lab.join(qual, "doc_id")
      .groupBy(col("source"), col("q_ppm"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("n_pos"))
    val w = Window.partitionBy(col("source")).orderBy(col("q_ppm"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byScore
      .withColumn("cum_before", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("rank2",
        lit(2L) * col("cum_before") + col("n") + lit(1L))
    ranked.groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"),
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_pos") * col("rank2")).as("sum_pos_rank2"))
      .select(col("source"), col("n_docs"), col("n_pos"),
        (col("n_docs") - col("n_pos")).as("n_neg"),
        (col("sum_pos_rank2") - col("n_pos") * (col("n_pos") + lit(1L)))
          .as("u2"))
      .withColumn("auc_ppm",
        expr("(u2 * 1000000) DIV nullif(2 * n_pos * n_neg, 0)"))
      .orderBy(col("source"))
  }

  val qualityAucOracle: String =
    s"""WITH $labSql,
       |qual AS (
       |  SELECT doc_id, CAST(round(quality * 1000000.0) AS BIGINT) AS q_ppm
       |  FROM (${TextOps.qualityOracle})),
       |byscore AS (
       |  SELECT l.source, q.q_ppm, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(l.label) AS BIGINT) AS n_pos
       |  FROM lab l JOIN qual q USING (doc_id)
       |  GROUP BY l.source, q.q_ppm),
       |ranked AS (
       |  SELECT *, coalesce(sum(n) OVER (PARTITION BY source ORDER BY q_ppm
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM byscore),
       |agg AS (
       |  SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
       |    CAST(sum(n_pos) AS BIGINT) AS n_pos,
       |    CAST(sum(n_pos * (2 * cum_before + n + 1)) AS BIGINT) AS sum_pos_rank2
       |  FROM ranked GROUP BY source)
       |SELECT source, n_docs, n_pos, n_docs - n_pos AS n_neg,
       |  sum_pos_rank2 - n_pos * (n_pos + 1) AS u2,
       |  ((sum_pos_rank2 - n_pos * (n_pos + 1)) * 1000000)
       |    // nullif(2 * n_pos * (n_docs - n_pos), 0) AS auc_ppm
       |FROM agg ORDER BY source""".stripMargin

  // -------------------------------------------------------------------------
  // q168 — hashed-feature linear classifier, train→apply across a split
  // -------------------------------------------------------------------------

  /** Feature-hash dimension: the model is AT MOST this many rows no
    * matter the corpus size — the hashing trick's broadcast guarantee. */
  val HashDim = 4096

  /** q168 — fastText-shape classifier: features are distinct unigrams ∪
    * adjacent bigrams hashed into [[HashDim]] buckets; per-feature weight
    * is the positive-document rate minus the class prior (integer ppm —
    * a log-free naive-Bayes-ish score whose sign separates the classes);
    * trained on the even (doc_id DIV 20) half, evaluated on the odd half
    * (the split key is the row-within-source index, so both halves cover
    * every source). Output: per-source confusion counts at threshold 0
    * plus exact score sums by label (sums, not averages — no division on
    * possibly-negative values). */
  def q168HashedClassifier(spark: SparkSession, dir: String): DataFrame = {
    val scored = evalScored(spark, dir)
    scored.groupBy(col("source")).agg(
      count(lit(1)).as("n_eval"),
      sum(col("label")).as("n_pos"),
      sum(when(col("label") === 1L && col("pred") === 1L, 1L).otherwise(0L)).as("tp"),
      sum(when(col("label") === 0L && col("pred") === 1L, 1L).otherwise(0L)).as("fp"),
      sum(when(col("label") === 1L && col("pred") === 0L, 1L).otherwise(0L)).as("fn"),
      sum(when(col("label") === 0L && col("pred") === 0L, 1L).otherwise(0L)).as("tn"),
      sum(when(col("label") === 1L, col("score_ppm")).otherwise(0L)).as("sum_pos_score_ppm"),
      sum(when(col("label") === 0L, col("score_ppm")).otherwise(0L)).as("sum_neg_score_ppm"))
      .orderBy(col("source"))
  }

  /** The classifier's eval-half per-doc relation — (doc_id, source,
    * label, score_ppm, pred) — shared by q168's confusion rollup and
    * q169's calibration bins. */
  private def evalScored(spark: SparkSession, dir: String): DataFrame =
    allScored(spark, dir).filter(expr("(doc_id DIV 20) % 2 = 1"))

  /** Every doc scored by the even-half-trained model — the inference
    * relation funnel v4 gates on. */
  private[operators] def allScored(spark: SparkSession, dir: String): DataFrame = {
    val lab = labTable(spark, dir)
    val bigrams = when(size(col("t")) >= 2,
      transform(sequence(lit(1), size(col("t")) - 1), i =>
        concat_ws("_", element_at(col("t"), i), element_at(col("t"), i + 1))))
      .otherwise(typedLit(Array.empty[String]))
    val feats = lab
      .select(col("doc_id"), col("source"), col("label"),
        explode(concat(col("t"), bigrams)).as("feat"))
      .select(col("doc_id"), col("source"), col("label"),
        (Sketches.h32(col("feat")) % HashDim).as("fid"))
      .distinct()
    val isTrain = expr("(doc_id DIV 20) % 2 = 0")

    val prior = lab.filter(isTrain)
      .agg(count(lit(1)).as("n_train"), sum(col("label")).as("n_pos_train"))
      .select(expr("(1000000 * n_pos_train) DIV n_train").as("prior_ppm"))
    val weights = feats.filter(isTrain)
      .groupBy(col("fid"))
      .agg(countDistinct(when(col("label") === 1L, col("doc_id"))).as("pos_df"),
        countDistinct(col("doc_id")).as("tot_df"))
      .crossJoin(broadcast(prior))
      .select(col("fid"),
        expr("(1000000 * pos_df) DIV tot_df - prior_ppm").as("w_ppm"))

    val docScores = feats
      .join(broadcast(weights), "fid")
      .groupBy(col("doc_id"))
      .agg(sum(col("w_ppm")).as("sc"))
    lab.select(col("doc_id"), col("source"), col("label"))
      .join(docScores, Seq("doc_id"), "left")
      .withColumn("score_ppm", coalesce(col("sc"), lit(0L)))
      .withColumn("pred", when(col("score_ppm") > 0, 1L).otherwise(0L))
  }

  /** The CTE chain from features through the eval-half `scores` relation
    * — shared by q168's and q169's oracles. */
  private def scoresChainSql: String =
    s"""featraw AS (
       |  SELECT doc_id, source, label, unnest(t) AS feat FROM lab
       |  UNION ALL
       |  SELECT doc_id, source, label,
       |    unnest(list_transform(range(1, len(t)), i -> t[i] || '_' || t[i+1])) AS feat
       |  FROM lab),
       |feath AS (SELECT doc_id, source, label, md5(feat) AS h FROM featraw),
       |feats AS (
       |  SELECT DISTINCT doc_id, source, label,
       |    (${Sketches.h32FromHexSql}) % $HashDim AS fid
       |  FROM feath),
       |prior AS (
       |  SELECT (1000000 * CAST(sum(label) AS BIGINT)) // CAST(count(*) AS BIGINT) AS prior_ppm
       |  FROM lab WHERE (doc_id // 20) % 2 = 0),
       |weights AS (
       |  SELECT fid,
       |    (1000000 * CAST(count(DISTINCT CASE WHEN label = 1 THEN doc_id END) AS BIGINT))
       |      // CAST(count(DISTINCT doc_id) AS BIGINT)
       |      - (SELECT prior_ppm FROM prior) AS w_ppm
       |  FROM feats WHERE (doc_id // 20) % 2 = 0 GROUP BY fid),
       |allscores AS (
       |  SELECT d.doc_id, d.source, d.label,
       |    coalesce(s.sc, 0) AS score_ppm
       |  FROM (SELECT doc_id, source, label FROM lab) d
       |  LEFT JOIN (
       |    SELECT f.doc_id, CAST(sum(w.w_ppm) AS BIGINT) AS sc
       |    FROM feats f JOIN weights w USING (fid)
       |    GROUP BY f.doc_id) s USING (doc_id)),
       |scores AS (SELECT * FROM allscores WHERE (doc_id // 20) % 2 = 1)""".stripMargin

  /** [[scoresChainSql]] exposed for funnel v4's oracle (which gates on
    * the all-docs `allscores` relation instead of the eval half). */
  private[operators] def scoresChainSqlShared: String = scoresChainSql
  private[operators] def labSqlShared: String = labSql

  val hashedClassifierOracle: String =
    s"""WITH $labSql,
       |$scoresChainSql
       |SELECT source, CAST(count(*) AS BIGINT) AS n_eval,
       |  CAST(sum(label) AS BIGINT) AS n_pos,
       |  CAST(sum(CASE WHEN label = 1 AND score_ppm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(sum(CASE WHEN label = 0 AND score_ppm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(sum(CASE WHEN label = 1 AND score_ppm <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(sum(CASE WHEN label = 0 AND score_ppm <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |  CAST(sum(CASE WHEN label = 1 THEN score_ppm ELSE 0 END) AS BIGINT) AS sum_pos_score_ppm,
       |  CAST(sum(CASE WHEN label = 0 THEN score_ppm ELSE 0 END) AS BIGINT) AS sum_neg_score_ppm
       |FROM scores GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------------------
  // q169 — calibration / reliability bins for the classifier scores
  // -------------------------------------------------------------------------

  /** Calibration bin width (ppm) and clamp bound: scores clamp to
    * [−1e6, 1e6) and bin into 8 fixed 250k-ppm buckets. */
  val BinWidthPpm = 250000L
  val ClampPpm = 1000000L

  /** q169 — the reliability-diagram relation (Niculescu-Mizil & Caruana
    * ICML'05 readout): eval-half scores clamped and binned into 8 fixed
    * buckets; per bin the observed positive rate vs the bin's score
    * range. The clamp+shift keeps the bin index a single non-negative
    * truncating division — no sign-dependent edge. Scale: one codegen'd
    * map over the q168 scores and one 8-row aggregate. */
  def q169CalibrationBins(spark: SparkSession, dir: String): DataFrame = {
    val scored = evalScored(spark, dir)
    scored
      .withColumn("clamped",
        greatest(lit(-ClampPpm), least(lit(ClampPpm - 1L), col("score_ppm"))))
      .withColumn("bin", expr(s"(clamped + $ClampPpm) DIV $BinWidthPpm"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("label")).as("n_pos"),
        sum(col("score_ppm")).as("sum_score_ppm"))
      .select(col("bin"),
        (col("bin") * lit(BinWidthPpm) - lit(ClampPpm)).as("bin_lo_ppm"),
        col("n"), col("n_pos"),
        expr("(1000000 * n_pos) DIV n").as("pos_rate_ppm"),
        col("sum_score_ppm"))
      .orderBy(col("bin"))
  }

  val calibrationBinsOracle: String =
    s"""WITH $labSql,
       |$scoresChainSql,
       |binned AS (
       |  SELECT label, score_ppm,
       |    (greatest(-$ClampPpm, least(${ClampPpm - 1L}, score_ppm)) + $ClampPpm)
       |      // $BinWidthPpm AS bin
       |  FROM scores)
       |SELECT bin, bin * $BinWidthPpm - $ClampPpm AS bin_lo_ppm,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(label) AS BIGINT) AS n_pos,
       |  (1000000 * CAST(sum(label) AS BIGINT)) // CAST(count(*) AS BIGINT) AS pos_rate_ppm,
       |  CAST(sum(score_ppm) AS BIGINT) AS sum_score_ppm
       |FROM binned GROUP BY bin ORDER BY bin""".stripMargin
}
