package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter prefilter for the decontamination join (Bloom 1970,
  * public) — the 100 TB hardening of [[Corpus.q67Decontaminate]].
  *
  * q67's plan already broadcasts the benchmark side and streams the
  * training corpus through a hash probe, but the probe table is the FULL
  * exploded (shingle → eval_doc) relation. When the benchmark suite grows
  * (many eval sets × many versions) that broadcast stops fitting. The
  * bloom filter compresses the eval SHINGLE SET to a fixed m-bit mask
  * (k = 3 md5-derived positions per shingle, [[MBits]]/8 bytes total) that
  * is embedded in the plan as a literal: the training corpus is screened
  * by a codegen'd bit probe (`graft_bloom_test`, zero allocation, inside
  * whole-stage codegen) BEFORE any join machinery, and only survivors
  * reach the exact verify join. Bloom filters have no false negatives, so
  * the final output is IDENTICAL to q67 — q100 is declared against q67's
  * oracle VERBATIM, the q92 pattern: the hatch must cost nothing in
  * correctness.
  *
  * Determinism: positions come from the portable md5 h32 ([[Sketches.h32]]),
  * so the mask — and therefore the q101 audit counts — are bit-identical
  * across engines, parallelism levels, and re-runs.
  *
  * Scale contract of the build: the mask is assembled on the driver from
  * the DISTINCT set bit positions, which is bounded by m (= [[MBits]])
  * rows no matter how large the eval corpus — the same bounded-collect
  * shape as the ANN centroid/seed broadcasts. The distinct itself
  * aggregates only the (tiny, fixed) benchmark side.
  *
  * Sizing: k = 3, m = 2^21 bits (256 KiB). At the sf0.1 fixture's ~4.5k
  * eval shingles the fill is ≈0.6% and false positives are ≈(kn/m)^k ≈
  * 2·10⁻⁷ — effectively every non-matching train shingle is dropped
  * before the join (see q101's recorded counts). At 100 TB, size m to
  * ~10 bits per eval shingle for a ~1.7% FP floor.
  */
object Bloom {

  val K = 3
  val MBits = 1 << 21 // 2,097,152 bits = 256 KiB packed

  /** The k bit positions of one shingle via Kirsch–Mitzenmacher double
    * hashing: ONE md5 per probe, h1 = top 8 hex chars, h2 = next 8, and
    * position_j = (h1 + j·h2) mod m — asymptotically as good as k
    * independent hashes (Kirsch & Mitzenmacher, ESA 2006, public) at a
    * third of the digest cost, which is what the probe's per-row price is
    * made of. Max intermediate value < 2^32 + 3·2^32 ≪ 2^63: no overflow. */
  def positions(g: Column): Column = {
    val h = md5(g)
    val h1 = conv(substring(h, 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(h, 9, 8), 16, 10).cast("long")
    transform(sequence(lit(0), lit(K - 1)), j =>
      ((h1 + j.cast("long") * h2) % MBits).cast("int"))
  }

  /** DuckDB spelling of [[positions]] for one j, over a hex column `h`
    * (h1/h2 are the two 8-hex-char halves, same nibble expansion as
    * [[Sketches.h32FromHexSql]]). */
  private def posSql(jExpr: String): String = {
    val nib = (off: Int, i: Int) =>
      s"(strpos('0123456789abcdef', substr(h, ${off + i}, 1)) - 1)"
    val h1 = (1 to 8).map(i => s"${nib(0, i)}::BIGINT * ${math.pow(16, 8 - i).toLong}")
      .mkString(" + ")
    val h2 = (1 to 8).map(i => s"${nib(8, i)}::BIGINT * ${math.pow(16, 8 - i).toLong}")
      .mkString(" + ")
    s"(($h1) + $jExpr * ($h2)) % $MBits"
  }

  /** The corpus-side probe: the fused one-digest kernel (see
    * [[graft.functions.BloomMight]]) — equivalent to
    * `graft_bloom_test(bits, positions(g))` but one compiled call/row. */
  def might(bits: Column, g: Column): Column =
    call_function("graft_bloom_might", bits, g, lit(K), lit(MBits))

  /** Driver-built packed bitmask of a shingle-set column `sh` — collect is
    * bounded by [[MBits]] distinct positions, never by data size. */
  def buildBits(evalShingled: DataFrame): Array[Byte] = {
    val pos = evalShingled.select(explode(col("sh")).as("g"))
      .select(explode(positions(col("g"))).as("p"))
      .distinct().collect().map(_.getInt(0))
    val bytes = new Array[Byte](MBits / 8)
    pos.foreach { p => bytes(p >>> 3) = (bytes(p >>> 3) | (1 << (p & 7))).toByte }
    bytes
  }

  /** q100 — decontamination with the bloom prefilter: output ≡ q67 (the
    * oracle IS q67's, verbatim — no false negatives means the exact verify
    * join sees every true pair). */
  def q100BloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Corpus.shingledDocs(spark, dir)
    val bits = buildBits(docs.filter(col("doc_id") % 50 === 0))
    val train = docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id").as("train_doc"), explode(col("sh")).as("g"))
      .filter(might(lit(bits), col("g")))
    Corpus.decontaminateJoin(train, Corpus.evalExploded(docs))
  }

  /** q101 — the bloom AUDIT (the q88/q89 standard): over every train-side
    * shingle occurrence, how many pass the mask, how many truly match the
    * eval set, and how many are false positives. One deterministic row;
    * the no-false-negative guarantee shows up as
    * n_pass_bloom = n_true_match + n_false_pos with every true match
    * passing. */
  def q101BloomAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Corpus.shingledDocs(spark, dir)
    val evalDocs = docs.filter(col("doc_id") % 50 === 0)
    val bits = buildBits(evalDocs)
    val evalG = evalDocs.select(explode(col("sh")).as("g")).distinct()
    docs.filter(col("doc_id") % 50 =!= 0)
      .select(explode(col("sh")).as("g"))
      .withColumn("pass", might(lit(bits), col("g")))
      .join(broadcast(evalG.withColumn("hit", lit(1))), Seq("g"), "left")
      .agg(count(lit(1)).as("n_train"),
           sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass_bloom"),
           sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_true_match"),
           sum(when(col("pass") && col("hit").isNull, 1L).otherwise(0L))
             .as("n_false_pos"))
  }

  val bloomAuditOracle: String =
    s"""WITH sh AS (
       |  SELECT doc_id, ${TextOps.duckShingles} AS s
       |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
       |        FROM documents)),
       |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0),
       |js AS (SELECT range AS j FROM range($K)),
       |evh AS (SELECT md5(g) AS h FROM ev),
       |pos AS (SELECT DISTINCT ${posSql("j")} AS p FROM evh CROSS JOIN js),
       |tr AS (SELECT doc_id AS train_doc, unnest(s) AS g
       |       FROM sh WHERE doc_id % 50 <> 0),
       |trh AS (SELECT train_doc, g, md5(g) AS h FROM tr),
       |trp AS (SELECT train_doc, g, j, ${posSql("j")} AS p
       |        FROM trh CROSS JOIN js),
       |passed AS (
       |  SELECT train_doc, g,
       |         CASE WHEN count(pos.p) = $K THEN 1 ELSE 0 END AS pass
       |  FROM trp LEFT JOIN pos ON trp.p = pos.p
       |  GROUP BY train_doc, g),
       |marked AS (
       |  SELECT p.train_doc, p.g, p.pass,
       |         CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM passed p LEFT JOIN ev e ON p.g = e.g)
       |SELECT CAST(count(*) AS BIGINT) AS n_train,
       |       CAST(sum(pass) AS BIGINT) AS n_pass_bloom,
       |       CAST(sum(hit) AS BIGINT) AS n_true_match,
       |       CAST(sum(CASE WHEN pass = 1 AND hit = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_false_pos
       |FROM marked""".stripMargin
}
