package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ENSEMBLE quality ranking — the FineWeb-Edu-style curation move of
  * fusing several weak per-doc signals into one selection order, done as
  * reciprocal-rank fusion (q175's integer RRF combiner applied to
  * doc-quality signals instead of retrieval rankings): no signal's scale
  * dominates, only its ORDER matters, and every fused score is an exact
  * integer.
  *
  * Signals (all already-audited library relations):
  *   - q35 rule-based quality (higher better),
  *   - q193 bigram-LM fluency ppm (higher better),
  *   - q190's token-collision ppm (LOWER better — diversity).
  *
  * Scale shape: each global rank comes from [[PrefixSum.partitionedRank]]
  * over a score-derived 256-way bucket (the two-phase no-single-task
  * discipline — a naive `row_number() OVER (ORDER BY score)` would funnel
  * the corpus through one task); the oracle uses exactly that naive
  * window (DuckDB is single-node), so equality also re-proves the
  * two-phase rank exact on every signal. Top-20 via TakeOrdered.
  */
object Ensemble {

  /** RRF constant (Cormack et al. SIGIR'09's k = 60). */
  val RrfK = 60L

  private def rankedBy(df: DataFrame, scoreCol: String, asc: Boolean,
                       out: String): DataFrame =
    PrefixSum.globalRankBy(df, scoreCol, asc, out)

  /** q200 — top-20 docs by integer RRF over the three signal ranks. */
  def q200EnsembleRank(spark: SparkSession, dir: String): DataFrame = {
    val qual = TextOps.q35QualityScore(spark, dir).select(col("doc_id"),
      expr("CAST(round(quality * 1000000.0) AS BIGINT)").as("s_qual"))
    val flu = Corpus.fluencyDocScores(spark, dir)
      .select(col("doc_id"), col("doc_ppm").as("s_flu"))
    // token-collision diversity signal (q190's token leg, per doc)
    val div = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
              explode(TextOps.tokens(lower(col("text")))).as("s"))
      .groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(expr("(1000000 * sum(cnt*cnt)) DIV (sum(cnt)*sum(cnt))").as("s_div"))
    // inner joins: a doc must carry every signal (fluency needs ≥2 tokens).
    // Each two-phase rank runs two control jobs (stats + bucket partials)
    // over its input — checkpoint the narrow (doc, signals[, ranks])
    // relation at each step so those jobs re-read |docs| small rows
    // instead of recomputing the signal builds (q200 measured 8.7 s →
    // ~2 s at sf0.1 from exactly this).
    val joined = qual.join(flu, "doc_id").join(div, "doc_id").localCheckpoint()
    val ranked = Seq(("s_qual", false, "r_quality"),
                     ("s_flu", false, "r_fluency"),
                     ("s_div", true, "r_diversity"))
      .foldLeft(joined) { case (df, (s, asc, out)) =>
        rankedBy(df, s, asc, out).localCheckpoint()
      }
    ranked
      .withColumn("rrf",
        expr(s"""1000000000 DIV ($RrfK + r_quality) +
                 1000000000 DIV ($RrfK + r_fluency) +
                 1000000000 DIV ($RrfK + r_diversity)"""))
      .select(col("doc_id"), col("r_quality"), col("r_fluency"),
              col("r_diversity"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  val ensembleRankOracle: String =
    s"""WITH q AS (
       |  SELECT doc_id, CAST(round(quality * 1000000.0) AS BIGINT) AS s_qual
       |  FROM (${TextOps.qualityOracle})),
       |t AS (
       |  SELECT doc_id, source, regexp_split_to_array(lower(text), '\\s+') AS wr
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, source,
       |    unnest([{'w1': wr[i], 'w2': wr[i+1]} for i in range(1, len(wr))], recursive := true)
       |  FROM t WHERE len(wr) >= 2),
       |lm AS (
       |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12,
       |    sum(count(*)) OVER (PARTITION BY w1) AS c1
       |  FROM bg GROUP BY w1, w2),
       |flu AS (
       |  SELECT doc_id,
       |    sum((1000000 * lm.c12) // CAST(lm.c1 AS BIGINT)) // count(*) AS s_flu
       |  FROM bg JOIN lm ON lm.w1 = bg.w1 AND lm.w2 = bg.w2
       |  GROUP BY doc_id),
       |div AS (
       |  SELECT doc_id, (1000000 * sum(cnt*cnt)) // (sum(cnt)*sum(cnt)) AS s_div
       |  FROM (
       |    SELECT doc_id, s, CAST(count(*) AS BIGINT) AS cnt
       |    FROM (SELECT doc_id, unnest(wr) AS s FROM t)
       |    GROUP BY doc_id, s)
       |  GROUP BY doc_id),
       |j AS (
       |  SELECT q.doc_id, s_qual, s_flu, s_div
       |  FROM q JOIN flu ON flu.doc_id = q.doc_id
       |  JOIN div ON div.doc_id = q.doc_id),
       |r AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY s_qual DESC, doc_id) AS BIGINT) AS r_quality,
       |    CAST(row_number() OVER (ORDER BY s_flu DESC, doc_id) AS BIGINT) AS r_fluency,
       |    CAST(row_number() OVER (ORDER BY s_div ASC, doc_id) AS BIGINT) AS r_diversity
       |  FROM j)
       |SELECT doc_id, r_quality, r_fluency, r_diversity,
       |  1000000000 // ($RrfK + r_quality) +
       |  1000000000 // ($RrfK + r_fluency) +
       |  1000000000 // ($RrfK + r_diversity) AS rrf
       |FROM r ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
}
