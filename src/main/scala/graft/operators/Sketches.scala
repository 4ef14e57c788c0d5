package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketching — HyperLogLog (Flajolet et al. 2007,
  * public) built deterministically from first principles, so a
  * 1000-executor run, a re-run, and the single-threaded DuckDB oracle all
  * produce the SAME estimate, bit for bit:
  *
  *   - the hash is md5 (the engine's one portable hash): the top 8 hex
  *     chars give a 32-bit value → 6 bucket bits (m = 64 registers) +
  *     26 rank bits;
  *   - the rank (leading-zero count) is an integer comparison ladder
  *     (Σ [w ≥ 2^k]), not float log2 — no libm anywhere;
  *   - a register is `max(rank)` — an algebraic aggregate with map-side
  *     partials: the 100 TB shuffle is m rows per group, nothing else;
  *   - the harmonic denominator Σ 2^−M_j is a sum of 64 binary fractions
  *     spanning ≤ 33 mantissa bits — EXACT in a double in any summation
  *     order, so parallel aggregation cannot perturb it;
  *   - the raw estimate α_64·m²/S is one multiply-divide. The
  *     linear-counting small-range branch is deliberately omitted: it
  *     needs ln() (libm, not bit-portable) and only matters when
  *     n ≲ 2.5m — a sketch sized m = 64 against fact-scale groups
  *     operates in the raw regime; size m up, not the correction, at
  *     100 TB (the estimator's contract here is determinism first).
  *
  * The exact distinct count rides along per group: the operator's check
  * is |estimate/exact − 1| within HLL's published error (≈1.04/√m ≈ 13%),
  * pinned in Round3cSpec; the oracle pins cross-engine equality.
  */
object Sketches {

  private val B = 6              // bucket bits → m = 64 registers
  private val M = 1 << B
  private val RankBits = 32 - B  // 26
  private val Alpha64 = 0.709    // α_m for m = 64 (Flajolet et al., Fig. 3)

  /** Integer bit-length of `w` (0 → 0) as Σ_{k} [w ≥ 2^k]. */
  private def bitLen(w: Column): Column =
    (0 until RankBits).map(k => when(w >= (1L << k), 1).otherwise(0))
      .reduce(_ + _)

  /** q86 — distinct users per event type: exact count + deterministic
    * HLL-64 estimate. */
  def q86HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val h32 = conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
              (h32 % lit(1L << RankBits)).as("w"),
              (h32 / lit(1L << RankBits)).cast("long").as("bucket"))
      .withColumn("rank", lit(RankBits + 1) - bitLen(col("w")))
    val regs = ev.groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rank")).as("reg"))
    val harm = regs.groupBy(col("event_type"))
      .agg(sum(pow(lit(0.5), col("reg"))).as("s_occ"),
           count(lit(1)).as("occupied"))
      // empty registers contribute 2^0 = 1 each
      .withColumn("s", col("s_occ") + (lit(M) - col("occupied")).cast("double"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(harm, "event_type")
      .select(col("event_type"), col("n_exact"), col("occupied"),
              round(lit(Alpha64 * M * M) / col("s"), 4).as("hll_estimate"))
      .orderBy(col("event_type"))
  }

  /** q90 — HLL MERGE/rollup: the property that justifies sketching at
    * all — per-group register vectors combine by bucket-wise max into the
    * EXACT sketch of the union, without touching the raw data again. Here:
    * per-event_type registers (the q86 partials, in steady state a
    * persisted m-rows-per-group artifact) merge into the all-types
    * estimate, and the oracle checks it equals the estimate a from-scratch
    * global sketch would give — the merge loses nothing, by construction.
    * At 100 TB this is the daily/weekly rollup: re-aggregate m·|groups|
    * register rows, never the corpus. */
  def q90HllRollup(spark: SparkSession, dir: String): DataFrame = {
    val h32 = conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
              (h32 % lit(1L << RankBits)).as("w"),
              (h32 / lit(1L << RankBits)).cast("long").as("bucket"))
      .withColumn("rank", lit(RankBits + 1) - bitLen(col("w")))
    // per-group registers (q86's partial), then the bucket-wise max merge
    val regs = ev.groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rank")).as("reg"))
    val merged = regs.groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
    merged.agg(
        sum(pow(lit(0.5), col("reg"))).as("s_occ"),
        count(lit(1)).as("occupied"))
      .withColumn("s", col("s_occ") + (lit(M) - col("occupied")).cast("double"))
      .select(lit("all").as("scope"), col("occupied"),
              round(lit(Alpha64 * M * M) / col("s"), 4).as("hll_estimate"))
  }

  val hllRollupOracle: String = {
    val nib = (i: Int) =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val h32Sql = (1 to 8)
      .map(i => s"${nib(i)}::BIGINT * ${math.pow(16, 8 - i).toLong}")
      .mkString(" + ")
    val bitLenSql = (0 until RankBits)
      .map(k => s"CASE WHEN w >= ${1L << k} THEN 1 ELSE 0 END")
      .mkString(" + ")
    // the oracle builds the GLOBAL sketch directly — the merge must equal it
    s"""WITH hashed AS (
       |  SELECT h32 % ${1L << RankBits} AS w, h32 // ${1L << RankBits} AS bucket
       |  FROM (SELECT $h32Sql AS h32
       |        FROM (SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM events))),
       |regs AS (
       |  SELECT bucket, max(${RankBits + 1} - ($bitLenSql)) AS reg
       |  FROM hashed GROUP BY bucket)
       |SELECT 'all' AS scope, CAST(count(*) AS BIGINT) AS occupied,
       |  round(${Alpha64 * M * M} /
       |        (sum(power(0.5, reg)) + ($M - count(*))), 4) AS hll_estimate
       |FROM regs""".stripMargin
  }

  val hllDistinctOracle: String = {
    val nib = (i: Int) =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)"
    // h32 = Σ nib_i · 16^(8−i)
    val h32Sql = (1 to 8)
      .map(i => s"${nib(i)}::BIGINT * ${math.pow(16, 8 - i).toLong}")
      .mkString(" + ")
    val bitLenSql = (0 until RankBits)
      .map(k => s"CASE WHEN w >= ${1L << k} THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH hashed AS (
       |  SELECT event_type, user_id, h32 % ${1L << RankBits} AS w,
       |         h32 // ${1L << RankBits} AS bucket
       |  FROM (SELECT event_type, user_id, $h32Sql AS h32
       |        FROM (SELECT event_type, user_id,
       |                     md5(CAST(user_id AS VARCHAR)) AS h
       |              FROM events))),
       |ranked AS (
       |  SELECT event_type, bucket, ${RankBits + 1} - ($bitLenSql) AS rank
       |  FROM hashed),
       |regs AS (
       |  SELECT event_type, bucket, max(rank) AS reg
       |  FROM ranked GROUP BY event_type, bucket),
       |harm AS (
       |  SELECT event_type,
       |    sum(power(0.5, reg)) + ($M - count(*)) AS s,
       |    CAST(count(*) AS BIGINT) AS occupied
       |  FROM regs GROUP BY event_type),
       |exact AS (
       |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
       |  FROM events GROUP BY event_type)
       |SELECT e.event_type, e.n_exact, h.occupied,
       |       round(${Alpha64 * M * M} / h.s, 4) AS hll_estimate
       |FROM exact e JOIN harm h ON e.event_type = h.event_type
       |ORDER BY e.event_type""".stripMargin
  }
}
