package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONTENT-DEFINED CHUNKING dedup (Muthitacharoen et al., "A Low-bandwidth
  * Network File System", SOSP'01 — the LBFS/FastCDC family): chunk
  * boundaries are declared wherever a rolling hash of the last [[K]] tokens
  * hits 0 mod [[BoundaryMod]], so boundaries depend only on LOCAL content.
  * Insert or delete one word and only the chunks touching the edit change
  * identity — every other chunk keeps its fingerprint — which is why CDC
  * catches shifted/partially-edited duplication that fixed-width chunking
  * (q126's stride windows) structurally misses, and why it is the storage-
  * dedup analog of the shingle family (q82) at chunk granularity.
  *
  * Position convention: a boundary at token position p (the END of a
  * K-gram) closes the chunk at p; token q belongs to chunk
  * |{boundaries p : p < q}|. The final chunk closes at the document end
  * with no boundary needed. Expected chunk length = [[BoundaryMod]] tokens.
  *
  * Determinism: the rolling hash is the engine's one portable primitive —
  * md5 of the K-gram text, top 8 hex digits as an integer
  * ([[Sketches.h32]]) — and chunk fingerprints are md5 over the
  * position-ordered token join, so both engines agree bit-for-bit.
  *
  * Scale shape: boundary positions are computed INSIDE the row (an array
  * filter over the token sequence — no window, no lag, no shuffle); after
  * the one posexplode the relation is (doc_id, pos, token) and groups by
  * (doc, chunk) — doc-bounded tasks. The only corpus-wide exchange is the
  * fingerprint groupBy, which carries 32-byte keys + counts (text never
  * shuffles across docs). The chunk key packs (doc_id, chunk) as
  * doc_id·2²⁰ + chunk — valid while docs stay under 2²⁰ chunks and ids
  * under 2⁴³; a production corpus widens the pack or keys on the pair.
  */
object Cdc {

  /** Rolling-hash window width in tokens. */
  val K = 3

  /** Boundary divisor: P(boundary) = 1/16 per position ⇒ ~16-token chunks. */
  val BoundaryMod = 16L

  /** (doc, chunk) relation: token count + md5 fingerprint per chunk. */
  private[graft] def chunks(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documentsWide(spark, dir)
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      // boundary positions, computed in array land (sequence guarded: Spark's
      // sequence(K, n) DESCENDS when n < K)
      .withColumn("bp",
        when(size(col("t")) >= K,
          filter(sequence(lit(K), size(col("t"))), p =>
            pmod(conv(substring(md5(concat_ws(" ",
                   slice(col("t"), p - (K - 1), lit(K)))), 1, 8), 16, 10)
                   .cast("long"),
                 lit(BoundaryMod)) === 0L))
        .otherwise(typedLit(Array.empty[Int])))
    d.select(col("doc_id"), col("source"), col("bp"),
        posexplode(col("t")).as(Seq("pos0", "w")))
      .withColumn("pos", (col("pos0") + 1).cast("long"))
      .withColumn("chunk",
        size(filter(col("bp"), p => p < col("pos"))).cast("long"))
      .groupBy(col("doc_id"), col("source"), col("chunk"))
      .agg(count(lit(1)).as("n_w"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
                    _.getField("w")))).as("fp"))
  }

  /** q222 — per source: chunk/word mass, distinct fingerprints, and the
    * duplicate chunk/word volume (occurrences beyond each fingerprint's
    * first (doc, chunk) keeper, min-key rule). */
  def q222CdcChunks(spark: SparkSession, dir: String): DataFrame = {
    val ch = chunks(spark, dir).localCheckpoint() // consumed twice below
    val key = col("doc_id") * lit(1048576L) + col("chunk")
    val fpStats = ch.groupBy(col("fp"))
      .agg(min(col("doc_id") * lit(1048576L) + col("chunk")).as("first_key"))
    ch.join(fpStats, "fp")
      .withColumn("is_dup", when(key =!= col("first_key"), 1L).otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_w")).as("n_words"),
        countDistinct(col("fp")).as("n_distinct_fp"),
        sum(col("is_dup")).as("dup_chunks"),
        sum(col("is_dup") * col("n_w")).as("dup_words"))
      .select(col("source"), col("n_chunks"), col("n_words"),
        col("n_distinct_fp"), col("dup_chunks"), col("dup_words"),
        // DECIMAL(38,0)-routed (the q203 rule): dup_words is a per-source
        // token count — 10⁶·mass wraps int64 silently past ~9e12 tokens
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * dup_words)
                DIV n_words AS BIGINT)""").as("dup_word_ppm"))
      .orderBy(col("source"))
  }

  /** toks → … → chunks CTE block, shared by [[cdcChunksOracle]] and the
    * q235 release-novelty oracle. */
  private val chunkCtes: String =
    s"""toks AS (
       |  SELECT doc_id, source, regexp_split_to_array(lower(text), '\\s+') AS t
       |  FROM documents
       |  WHERE len(regexp_split_to_array(lower(text), '\\s+')) >= 1),
       |kg AS (
       |  SELECT doc_id, p, md5(array_to_string(t[p-${K - 1}:p], ' ')) AS h
       |  FROM (SELECT doc_id, t, unnest(range($K, len(t) + 1)) AS p FROM toks)),
       |bounds AS (
       |  SELECT doc_id, p FROM kg
       |  WHERE (${Sketches.h32FromHexSql}) % $BoundaryMod = 0),
       |words AS (
       |  SELECT doc_id, source, i AS pos, t[i] AS w
       |  FROM (SELECT doc_id, source, t, unnest(range(1, len(t) + 1)) AS i
       |        FROM toks)),
       |chunked AS (
       |  SELECT w.doc_id, w.source, w.pos, w.w, count(b.p) AS chunk
       |  FROM words w LEFT JOIN bounds b
       |    ON b.doc_id = w.doc_id AND b.p < w.pos
       |  GROUP BY w.doc_id, w.source, w.pos, w.w),
       |chunks AS (
       |  SELECT doc_id, source, chunk, CAST(count(*) AS BIGINT) AS n_w,
       |    md5(string_agg(w, ' ' ORDER BY pos)) AS fp
       |  FROM chunked GROUP BY doc_id, source, chunk)""".stripMargin

  val cdcChunksOracle: String =
    s"""WITH $chunkCtes,
       |fs AS (
       |  SELECT fp, min(doc_id * 1048576 + chunk) AS first_key
       |  FROM chunks GROUP BY fp)
       |SELECT c.source, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(c.n_w) AS BIGINT) AS n_words,
       |  CAST(count(DISTINCT c.fp) AS BIGINT) AS n_distinct_fp,
       |  CAST(sum(CASE WHEN c.doc_id * 1048576 + c.chunk <> f.first_key
       |       THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
       |  CAST(sum(CASE WHEN c.doc_id * 1048576 + c.chunk <> f.first_key
       |       THEN c.n_w ELSE 0 END) AS BIGINT) AS dup_words,
       |  CAST((CAST(1000000 AS HUGEINT)
       |        * sum(CASE WHEN c.doc_id * 1048576 + c.chunk <> f.first_key
       |              THEN c.n_w ELSE 0 END))
       |    // sum(c.n_w) AS BIGINT) AS dup_word_ppm
       |FROM chunks c JOIN fs f USING (fp)
       |GROUP BY c.source ORDER BY c.source""".stripMargin

  // -------------------------------------------------------------------------
  // q235 — RELEASE chunk NOVELTY: q185 diffs releases at DOC granularity;
  // at chunk granularity the question becomes "how much of the new
  // release's CONTENT is genuinely new" — a re-crawl that re-ships 90% of
  // its token mass in carried-over chunks is mostly storage, not signal.
  // Release carve = the q170 convention (doc_id % 3 == 0 is the new
  // release); a new-release chunk is CARRIED iff its fingerprint exists
  // anywhere in the old release, else NOVEL. CDC (not fixed-stride)
  // chunking is what makes this meaningful: shifted boilerplate still
  // matches (the shift-resilience Round7bSpec proves).
  //
  // Scale: the chunk relation is built once ([[chunks]]' discipline); the
  // old-release fingerprint set is a distinct over 32-byte keys; the
  // classification join is fingerprint-keyed (left semi shape). The ppm
  // routes through DECIMAL(38,0)/HUGEINT (token-count products).
  // -------------------------------------------------------------------------

  /** q235 — per source: new-release chunk/word mass, carried vs novel
    * split, and novelty_ppm of the word mass. */
  def q235ReleaseChunkNovelty(spark: SparkSession, dir: String): DataFrame = {
    val ch = chunks(spark, dir).localCheckpoint() // old + new legs below
    val oldFps = ch.filter(col("doc_id") % 3 =!= 0)
      .select(col("fp")).distinct()
    val marked = ch.filter(col("doc_id") % 3 === 0)
      .join(oldFps.withColumn("carried", lit(1L)), Seq("fp"), "left")
      .withColumn("carried", coalesce(col("carried"), lit(0L)))
    marked.groupBy(col("source"))
      .agg(count(lit(1)).as("new_chunks"),
        sum(col("n_w")).as("new_words"),
        sum(col("carried")).as("carried_chunks"),
        sum(col("carried") * col("n_w")).as("carried_words"))
      .select(col("source"), col("new_chunks"), col("new_words"),
        col("carried_chunks"), col("carried_words"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0))
                * (new_words - carried_words))
                DIV new_words AS BIGINT)""").as("novelty_ppm"))
      .orderBy(col("source"))
  }

  // -------------------------------------------------------------------------
  // q236 — CDC chunk-SIZE distribution audit: content-defined chunking
  // only delivers its dedup guarantee if cut points actually behave like
  // independent p = 1/BoundaryMod trials (geometric length distribution,
  // mean ≈ BoundaryMod) — correlated hashes or degenerate token streams
  // skew the distribution toward giant chunks (shift resilience dies) or
  // dust (index bloat). This is the monitoring readout the FastCDC
  // literature normalizes chunkers against: per source, the doubling-
  // bucket length histogram (≤4, ≤8, ≤16, ≤32, >32) with chunk and word
  // mass per bucket.
  //
  // Scale: one pass over the [[chunks]] relation (already narrow), one
  // partial-aggregated groupBy of a 5-value bucket × |sources| grid.
  // -------------------------------------------------------------------------

  /** q236 — (source, len_bucket ∈ 0..4, n_chunks, n_words). */
  def q236ChunkSizeAudit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = when(col("n_w") <= 4, 0L).when(col("n_w") <= 8, 1L)
      .when(col("n_w") <= 16, 2L).when(col("n_w") <= 32, 3L).otherwise(4L)
    chunks(spark, dir)
      .groupBy(col("source"), bucket.as("len_bucket"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_w")).as("n_words"))
      .orderBy(col("source"), col("len_bucket"))
  }

  val chunkSizeAuditOracle: String =
    s"""WITH $chunkCtes
       |SELECT source,
       |  CAST(CASE WHEN n_w <= 4 THEN 0 WHEN n_w <= 8 THEN 1
       |            WHEN n_w <= 16 THEN 2 WHEN n_w <= 32 THEN 3
       |            ELSE 4 END AS BIGINT) AS len_bucket,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(n_w) AS BIGINT) AS n_words
       |FROM chunks
       |GROUP BY source, len_bucket ORDER BY source, len_bucket""".stripMargin

  val releaseChunkNoveltyOracle: String =
    s"""WITH $chunkCtes,
       |old_fps AS (
       |  SELECT DISTINCT fp FROM chunks WHERE doc_id % 3 <> 0),
       |marked AS (
       |  SELECT c.source, c.n_w,
       |    CASE WHEN o.fp IS NOT NULL THEN 1 ELSE 0 END AS carried
       |  FROM chunks c LEFT JOIN old_fps o ON o.fp = c.fp
       |  WHERE c.doc_id % 3 = 0)
       |SELECT source, CAST(count(*) AS BIGINT) AS new_chunks,
       |  CAST(sum(n_w) AS BIGINT) AS new_words,
       |  CAST(sum(carried) AS BIGINT) AS carried_chunks,
       |  CAST(sum(carried * n_w) AS BIGINT) AS carried_words,
       |  CAST((CAST(1000000 AS HUGEINT) * (sum(n_w) - sum(carried * n_w)))
       |    // sum(n_w) AS BIGINT) AS novelty_ppm
       |FROM marked GROUP BY source ORDER BY source""".stripMargin
}
