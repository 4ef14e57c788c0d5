package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Code-vs-prose routing audit over `documents` — the mixture split every
  * LLM corpus runs before tokenizer training (code is tokenized, weighted,
  * and deduplicated differently from prose, so misrouted docs poison both
  * sides). The detector is symbol-token density: the fraction of
  * whitespace tokens that are code punctuation (`; { } ( ) =`) or
  * digit-suffixed identifiers (`x1`, `fn3` — the α+digit shape natural
  * prose essentially never produces but generated/templated code always
  * does).
  *
  * The synthetic corpus is pure prose, so — exactly like [[Pii.piiTable]]
  * and the image fixture — [[codeTable]] appends deterministic code
  * snippets derived from `doc_id` arithmetic, recomputed identically by
  * the DuckDB oracle. The DETECTOR is what's under test: it scans the
  * full real text plus the injected tail, and real-prose tokens must
  * contribute zero hits (pinned in the spec).
  *
  * Scale: one codegen'd row-wise map (array filter over the token split —
  * no explode, no UDF) plus one partial-aggregated `groupBy(source)`; the
  * shuffle carries 4 longs per source. At 100 TB the cost is the scan.
  */
object CodeDetect {

  /** Classification bar: ≥ 5% symbol tokens routes a doc to the code side
    * (real code sits at 20–40%; prose at ~0). */
  val CodeDensityMinPpm = 50000L

  /** Deterministic code tail: doc_id % 5 == 0 gets an assignment/branch
    * snippet (12 symbol tokens of 21), doc_id % 11 == 0 a function def
    * (10 of 16); moduli are coprime to the source stride so every source
    * sees a mix, and 55-multiples carry both (density well over the bar
    * either way). */
  def codeTail(d: Column): Column = {
    def s(c: Column) = c.cast("string")
    concat(
      when(d % 5 === 0,
        concat(lit(" var x"), s(d % 7), lit(" = "), s(d % 13),
               lit(" ; if ( x"), s(d % 7), lit(" > 0 ) { return x"),
               s(d % 7), lit(" ; }"))).otherwise(""),
      when(d % 11 === 0,
        concat(lit(" def fn"), s(d % 9), lit(" ( a , b ) { a = a + b ; }")))
        .otherwise(""))
  }

  /** The SQL twin of [[codeTail]] — kept on ONE line: it is interpolated
    * into a stripMargin'd oracle, where a continuation line starting with
    * `||` would lose its first pipe to the margin strip. */
  val codeTailSql: String =
    "CASE WHEN doc_id % 5 = 0 THEN ' var x' || (doc_id % 7) || ' = ' || (doc_id % 13) || " +
    "' ; if ( x' || (doc_id % 7) || ' > 0 ) { return x' || (doc_id % 7) || ' ; }' ELSE '' END || " +
    "CASE WHEN doc_id % 11 = 0 THEN ' def fn' || (doc_id % 9) || ' ( a , b ) { a = a + b ; }' ELSE '' END"

  /** Symbol-token set (exact-match tokens, not substrings — `=` the token,
    * not `=` inside a word). */
  val SymbolTokens: Seq[String] = Seq(";", "{", "}", "(", ")", "=")

  /** Digit-suffixed identifier shape (Java ∩ RE2, fully anchored). */
  val IdentPat = "^[a-z]+[0-9]+$"

  def codeTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      concat(col("text"), codeTail(col("doc_id"))).as("code_text"))

  /** q220 — per source: docs, docs routed to code, symbol-token mass, and
    * the mean per-doc symbol density (exact integer ppm, truncating DIV). */
  def q220CodeDetect(spark: SparkSession, dir: String): DataFrame = {
    val t = split(lower(col("code_text")), "\\s+")
    val isSym = (x: Column) =>
      x.isInCollection(SymbolTokens) || x.rlike(IdentPat)
    codeTable(spark, dir)
      .select(col("source"),
        size(filter(t, isSym)).cast("long").as("n_sym"),
        size(t).cast("long").as("n_tok"))
      .select(col("source"), col("n_sym"), col("n_tok"),
        expr("(1000000 * n_sym) DIV n_tok").as("density_ppm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("density_ppm") >= CodeDensityMinPpm, 1L).otherwise(0L))
          .as("n_code_docs"),
        sum(col("n_sym")).as("sym_tokens"),
        expr("sum(density_ppm) DIV count(1)").as("avg_density_ppm"))
      .orderBy(col("source"))
  }

  val codeDetectOracle: String =
    s"""WITH c AS (
       |  SELECT doc_id, source, lower(text || $codeTailSql) AS code_text
       |  FROM documents),
       |m AS (
       |  SELECT source,
       |    CAST(len(list_filter(regexp_split_to_array(code_text, '\\s+'),
       |      x -> x IN (';', '{', '}', '(', ')', '=')
       |           OR regexp_matches(x, '$IdentPat'))) AS BIGINT) AS n_sym,
       |    CAST(len(regexp_split_to_array(code_text, '\\s+')) AS BIGINT) AS n_tok
       |  FROM c)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN (1000000 * n_sym) // n_tok >= $CodeDensityMinPpm
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_code_docs,
       |  CAST(sum(n_sym) AS BIGINT) AS sym_tokens,
       |  CAST(sum((1000000 * n_sym) // n_tok) // count(*) AS BIGINT)
       |    AS avg_density_ppm
       |FROM m GROUP BY source ORDER BY source""".stripMargin
}
