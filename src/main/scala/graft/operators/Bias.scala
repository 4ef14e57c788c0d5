package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Score-BIAS audit — exact Kendall τ_a rank correlation between the q35
  * quality score and raw token length. Length bias is the classic
  * quality-model pathology (a "quality" signal that secretly rewards
  * length reweights the corpus toward long docs); the audit quantifies it
  * with a tie-aware, log-free, integer-exact rank correlation.
  *
  * Method: both signals get a global two-phase rank
  * ([[PrefixSum.globalRankBy]] — no naive global window), ranks collapse
  * to DECILES, and τ_a computes from the ≤100-row decile CONTINGENCY
  * table: concordant/discordant mass is a bounded-dimension self-join
  * (≤10⁴ cell pairs regardless of corpus size), so no doc-pair relation
  * ever exists. Deciling coarsens τ (within-decile order is tied by
  * construction) — deterministic and scale-free, which is the point of
  * an audit number.
  *
  * Signed division: Spark's DIV truncates toward zero, DuckDB's // floors
  * — they disagree on negatives, so τ routes through sign·(|num| DIV den).
  */
object Bias {

  /** q203 — one row: docs, unordered pair counts (concordant /
    * discordant / tied), signed τ_a in ppm. */
  def q203LengthBias(spark: SparkSession, dir: String): DataFrame = {
    // checkpoint between the two-phase ranks: their control jobs re-read
    // the narrow scored relation instead of recomputing the q35 scoring
    // (the q200 lesson)
    val scored = TextOps.q35QualityScore(spark, dir)
      .select(col("doc_id"), col("n_tok"),
        expr("CAST(round(quality * 1000000.0) AS BIGINT)").as("s_qual"))
      .localCheckpoint()
    val ranked = PrefixSum.globalRankBy(
      PrefixSum.globalRankBy(scored, "s_qual", asc = false, "rq")
        .localCheckpoint(),
      "n_tok", asc = false, "rl")
    val cells = ranked
      .crossJoin(ranked.agg(count(lit(1)).as("n"))) // 1-row control
      .select(expr("(10 * (rq - 1)) DIV n").as("dq"),
              expr("(10 * (rl - 1)) DIV n").as("dl"), col("n"))
      .groupBy(col("dq"), col("dl"), col("n"))
      .agg(count(lit(1)).as("c"))
    val a = cells.select(col("dq").as("dq1"), col("dl").as("dl1"),
                         col("c").as("c1"), col("n"))
    val b = cells.select(col("dq").as("dq2"), col("dl").as("dl2"),
                         col("c").as("c2"))
    // ordered cell pairs (≤10⁴ rows); each unordered doc pair counted
    // twice across i≠j cells, so the /2 below is exact (sums are even).
    // Pair-count arithmetic is O(n²) and the ppm numerator multiplies it
    // by 1e6 — int64 wraps silently in Spark beyond ~6M docs while DuckDB
    // errors, so everything O(n²) routes through DECIMAL(38,0) (HUGEINT
    // in the oracle), the q186 discipline. τ uses the DOUBLED counts
    // against n(n−1) directly, so no decimal halving enters the division.
    a.crossJoin(b)
      .select(col("n"),
        when((col("dq1") - col("dq2")) * (col("dl1") - col("dl2")) > 0,
             expr("CAST(c1 AS DECIMAL(38,0)) * c2"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))")).as("conc2"),
        when((col("dq1") - col("dq2")) * (col("dl1") - col("dl2")) < 0,
             expr("CAST(c1 AS DECIMAL(38,0)) * c2"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))")).as("disc2"))
      .groupBy(col("n"))
      .agg(expr("sum(conc2)").as("conc2s"), expr("sum(disc2)").as("disc2s"))
      .select(col("n").as("n_docs"),
        expr("CAST(conc2s / 2 AS BIGINT)").as("concordant"),
        expr("CAST(disc2s / 2 AS BIGINT)").as("discordant"),
        expr("CAST((CAST(n AS DECIMAL(38,0)) * (n - 1) - conc2s - disc2s) / 2 AS BIGINT)")
          .as("tied"),
        expr("""CASE WHEN conc2s >= disc2s
                THEN CAST((conc2s - disc2s) * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)
                ELSE -CAST((disc2s - conc2s) * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)
                END""").as("tau_a_ppm"))
  }

  // -------------------------------------------------------------------------
  // q212 — per-source QUANTILE-NORMALIZATION audit: compare every doc's
  // GLOBAL quality decile against its decile WITHIN its source. A quality
  // model calibrated on one domain systematically mis-ranks another
  // (classifier-based filters are notoriously source-shifted — the
  // motivation for per-source thresholds in CCNet-style pipelines);
  // rank-based normalization is the standard correction, and this audit
  // quantifies how much re-ranking it would actually do: per source, how
  // many docs change decile, total and max displacement.
  //
  // Scale: BOTH rank passes are two-phase ([[PrefixSum]]) — the global
  // decile via globalRankBy, the within-source decile via partitionedRank
  // with a global score-derived bucket (bucket boundaries respect the
  // order inside every source). No naive global or per-source window ever
  // plans; a source owning 90% of a 100 TB corpus still splits across
  // ~256 bucketed window partitions. The readout aggregates to |sources|
  // rows. Deciles are integer-exact: d = (10·(rank−1)) DIV n.
  // -------------------------------------------------------------------------

  /** q212 — per source: docs, docs whose decile shifts, Σ|shift|, max. */
  def q212QuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    val base = TextOps.q35QualityScore(spark, dir)
      .select(col("doc_id"),
        expr("CAST(round(quality * 1000000.0) AS BIGINT)").as("s_q"))
      .join(graft.Tables.documents(spark, dir)
              .select(col("doc_id"), col("source")),
            Seq("doc_id"))
      .localCheckpoint() // rank control jobs re-read this, not the scoring
    val g = PrefixSum.globalRankBy(base, "s_q", asc = false, "rg")
      .localCheckpoint()
    // within-source rank, two-phase: score-derived global bucket (order-
    // respecting in every source), offsets |sources|·256 driver rows.
    // The same sanctioned bounded collect that sizes the buckets also
    // reads n_all, so the global decile needs no 1-row control relation
    // (whose global count aggregate would plan the only single-partition
    // exchange in the query).
    val stats = g.agg(min(-col("s_q")), max(-col("s_q")),
                      count(lit(1))).collect().head
    val (mn, mx, nAll) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val width = math.max(1L, (mx - mn) / 256 + 1)
    val bucketed = g.withColumn("__ord", -col("s_q"))
      .withColumn("__b", expr(s"(__ord - ${mn}L) DIV ${width}L"))
    val ranked = PrefixSum.partitionedRank(bucketed, "source", "__b",
        Seq("__ord", "doc_id"), "rs")
      .drop("__ord", "__b")
    val deciled = ranked
      .join(ranked.groupBy(col("source")).agg(count(lit(1)).as("n_src")),
            Seq("source"))
      .select(col("source"),
        expr(s"(10 * (rg - 1)) DIV ${nAll}L").as("dg"),
        expr("(10 * (rs - 1)) DIV n_src").as("ds"))
    deciled.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dg") =!= col("ds"), 1L).otherwise(0L)).as("n_shifted"),
        sum(abs(col("dg") - col("ds"))).as("shift_sum"),
        max(abs(col("dg") - col("ds"))).as("max_shift"))
      .orderBy(col("source"))
  }

  val quantileNormOracle: String = {
    val qual = TextOps.qualityOracle
    s"""WITH q AS (
       |  SELECT doc_id, CAST(round(quality * 1000000.0) AS BIGINT) AS s_q
       |  FROM ($qual)),
       |j AS (
       |  SELECT q.doc_id, d.source, q.s_q
       |  FROM q JOIN documents d USING (doc_id)),
       |r AS (
       |  SELECT source,
       |    row_number() OVER (ORDER BY s_q DESC, doc_id) AS rg,
       |    row_number() OVER (PARTITION BY source
       |                       ORDER BY s_q DESC, doc_id) AS rs,
       |    count(*) OVER () AS n_all,
       |    count(*) OVER (PARTITION BY source) AS n_src
       |  FROM j),
       |d AS (
       |  SELECT source, (10 * (rg - 1)) // n_all AS dg,
       |    (10 * (rs - 1)) // n_src AS ds
       |  FROM r)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN dg != ds THEN 1 ELSE 0 END) AS BIGINT) AS n_shifted,
       |  CAST(sum(abs(dg - ds)) AS BIGINT) AS shift_sum,
       |  CAST(max(abs(dg - ds)) AS BIGINT) AS max_shift
       |FROM d GROUP BY source ORDER BY source""".stripMargin
  }

  val lengthBiasOracle: String = {
    // the same quality subquery the q200 oracle embeds
    val qual = TextOps.qualityOracle
    s"""WITH q AS (
       |  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       |    CAST(round(quality * 1000000.0) AS BIGINT) AS s_qual
       |  FROM ($qual)),
       |r AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY s_qual DESC, doc_id) AS BIGINT) AS rq,
       |    CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id) AS BIGINT) AS rl,
       |    count(*) OVER () AS n
       |  FROM q),
       |cells AS (
       |  SELECT (10 * (rq - 1)) // n AS dq, (10 * (rl - 1)) // n AS dl,
       |    CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS c
       |  FROM r GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a.n,
       |    sum(CASE WHEN (a.dq - b.dq) * (a.dl - b.dl) > 0
       |             THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS conc2s,
       |    sum(CASE WHEN (a.dq - b.dq) * (a.dl - b.dl) < 0
       |             THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS disc2s
       |  FROM cells a CROSS JOIN cells b GROUP BY a.n)
       |SELECT n AS n_docs,
       |  CAST(conc2s // 2 AS BIGINT) AS concordant,
       |  CAST(disc2s // 2 AS BIGINT) AS discordant,
       |  CAST((CAST(n AS HUGEINT) * (n - 1) - conc2s - disc2s) // 2 AS BIGINT) AS tied,
       |  CASE WHEN conc2s >= disc2s
       |    THEN CAST((conc2s - disc2s) * 1000000 // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT)
       |    ELSE -CAST((disc2s - conc2s) * 1000000 // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT)
       |  END AS tau_a_ppm
       |FROM pairs""".stripMargin
  }
}
