package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection + redaction over `documents` — the scrubbing stage every
  * training-data pipeline runs before a corpus ships (emails, phone
  * numbers, IP addresses).
  *
  * The synthetic corpus contains no PII, so — like the image fixture in
  * [[Multimodal.imageTable]] — [[piiTable]] embeds deterministic markers
  * derived from `doc_id` arithmetic, recomputed identically by the DuckDB
  * oracle from the same base table. The DETECTOR is the operator under
  * test: the patterns run over the full real text plus the injected tail,
  * and the oracle agreeing on every count/fingerprint proves the regex
  * semantics, replacement order, and byte-level output match.
  *
  * Portability: patterns stay in the Java-regex ∩ RE2 common subset (no
  * lookaround, no backreferences, no `\b`), replacements are plain
  * literals (no `$`/`\` group refs), and DuckDB's `regexp_replace` gets
  * the `'g'` flag to match Spark's replace-all default.
  *
  * Scale: both queries are one codegen'd row-wise map (regex per row, no
  * UDF) followed by a single partial-aggregated `groupBy(source)` — the
  * shuffle carries ~8 longs per source, so at 100 TB the cost is the scan
  * itself, parallel by file split.
  */
object Pii {

  /** Email / phone / IPv4 patterns — Java ∩ RE2 subset (see scaladoc). */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePat = "\\+1-[0-9]{3}-[0-9]{4}"
  val ipPat    = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** documents + deterministic PII tail: email on doc_id%3, a second email
    * on %9 (exercises per-doc counts > 1), phone on %13, IPv4 on %7 — the
    * moduli are coprime to the source stride (20) so every source sees a
    * mix. The SQL twin lives in the oracle CTE `pii`. */
  /** The injected tail alone (composable — funnel v3 stacks it with
    * [[UrlOps.urlTail]]); `d` is the doc_id column. */
  def piiTail(d: Column): Column = {
    def s(c: Column) = c.cast("string")
    concat(
      when(d % 3 === 0, concat(lit(" contact user"), s(d), lit("@example.com"))).otherwise(""),
      when(d % 9 === 0, concat(lit(" cc admin"), s(d), lit("@ex"), s(d % 7), lit(".net"))).otherwise(""),
      when(d % 13 === 0, concat(lit(" call +1-555-"), lpad(s(d % 10000), 4, "0"))).otherwise(""),
      when(d % 7 === 0, concat(lit(" host 10."), s(d % 256), lit("."), s((d * 3) % 256),
                               lit("."), s((d * 7) % 256))).otherwise(""))
  }

  /** The SQL twin of [[piiTail]] — `'' || <this>` appends the markers. */
  val piiTailSql: String =
    """CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
      || CASE WHEN doc_id % 9 = 0 THEN ' cc admin' || doc_id || '@ex' || (doc_id % 7) || '.net' ELSE '' END
      || CASE WHEN doc_id % 13 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      || CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || (doc_id % 256) || '.' || ((doc_id*3) % 256) || '.' || ((doc_id*7) % 256) ELSE '' END"""

  def piiTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      concat(col("text"), piiTail(col("doc_id"))).as("pii_text"))

  private def nMatches(pat: String): Column =
    size(regexp_extract_all(col("pii_text"), lit(pat), lit(0))).cast("long")

  /** q144 — PII scan report per source: docs carrying each PII class and
    * total match counts (the triage readout that decides whether a source
    * needs scrubbing at all). */
  def q144PiiScan(spark: SparkSession, dir: String): DataFrame =
    piiTable(spark, dir)
      .select(col("source"),
        nMatches(emailPat).as("n_email"),
        nMatches(phonePat).as("n_phone"),
        nMatches(ipPat).as("n_ip"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_email") > 0, 1L).otherwise(0L)).as("docs_with_email"),
        sum(when(col("n_phone") > 0, 1L).otherwise(0L)).as("docs_with_phone"),
        sum(when(col("n_ip") > 0, 1L).otherwise(0L)).as("docs_with_ip"),
        sum(col("n_email")).as("total_emails"),
        sum(col("n_phone")).as("total_phones"),
        sum(col("n_ip")).as("total_ips"))
      .orderBy(col("source"))

  /** The redaction column program: email → phone → IPv4, each replace-all.
    * Email first so an address's digits can never be half-eaten by the IP
    * pass; the order is part of the cross-engine contract. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPat, "[EMAIL]"),
        phonePat, "[PHONE]"),
      ipPat, "[IP]")

  /** q145 — redaction parity audit: per-source doc counts, removed-char
    * mass, and md5 fingerprints of the redacted text. The min/max/distinct
    * md5 columns are the strong check — one byte of divergence anywhere in
    * any redacted doc and the fingerprint set differs. */
  def q145PiiRedact(spark: SparkSession, dir: String): DataFrame =
    piiTable(spark, dir)
      .select(col("source"), col("pii_text"), redact(col("pii_text")).as("redacted"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("redacted") =!= col("pii_text"), 1L).otherwise(0L)).as("n_redacted"),
        sum((length(col("pii_text")) - length(col("redacted"))).cast("long")).as("chars_removed"),
        min(md5(col("redacted"))).as("min_fp"),
        max(md5(col("redacted"))).as("max_fp"),
        countDistinct(md5(col("redacted"))).as("n_distinct"))
      .orderBy(col("source"))

  // built by concatenation: piiTailSql's '||' continuation lines must
  // never pass under a stripMargin
  private val piiCte =
    "WITH pii AS (\n  SELECT doc_id, source,\n    text || " + piiTailSql +
    "\n    AS pii_text\n  FROM documents)"

  // NB: piiCte is concatenated, not interpolated inside a stripMargin
  // template — its '||' continuation lines would be re-stripped.
  val piiScanOracle: String =
    piiCte + ",\n" + """cnts AS (
      |  SELECT source,
      |    len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
      |    len(regexp_extract_all(pii_text, '\+1-[0-9]{3}-[0-9]{4}')) AS n_phone,
      |    len(regexp_extract_all(pii_text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ip
      |  FROM pii)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
      |  CAST(sum(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
      |  CAST(sum(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ip,
      |  CAST(sum(n_email) AS BIGINT) AS total_emails,
      |  CAST(sum(n_phone) AS BIGINT) AS total_phones,
      |  CAST(sum(n_ip) AS BIGINT) AS total_ips
      |FROM cnts GROUP BY source ORDER BY source""".stripMargin

  val piiRedactOracle: String =
    piiCte + ",\n" + """red AS (
      |  SELECT source, pii_text,
      |    regexp_replace(regexp_replace(regexp_replace(pii_text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |      '\+1-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
      |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g') AS redacted
      |  FROM pii)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN redacted <> pii_text THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
      |  CAST(sum(length(pii_text) - length(redacted)) AS BIGINT) AS chars_removed,
      |  min(md5(redacted)) AS min_fp, max(md5(redacted)) AS max_fp,
      |  CAST(count(DISTINCT md5(redacted)) AS BIGINT) AS n_distinct
      |FROM red GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------------------
  // q206 — K-ANONYMITY quasi-identifier audit (Sweeney 2002): PII
  // regexes catch DIRECT identifiers; re-identification risk also lives
  // in quasi-identifier COMBINATIONS — here (lang, source, token-length
  // decade), the release-metadata triple an attacker can always observe.
  // A doc whose combination has fewer than K members is re-identifiable
  // within its group; the audit counts those per source plus the group
  // landscape. The privacy complement of q144/q145's detection/redaction.
  //
  // Scale: one codegen'd map to the quasi-identifier triple, one
  // partial-aggregated group count, one keyed join back — the q27 exact-
  // dedup shape with a threshold readout.
  // -------------------------------------------------------------------------

  /** q206's anonymity threshold. */
  val AnonK = 5L

  /** q206 — per source: docs, QI groups, docs in below-K groups,
    * smallest group, risk ppm. */
  def q206KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        expr("CAST(size(split(lower(text), '\\\\s+')) AS BIGINT) DIV 10")
          .as("len_decade"))
    val groups = d.groupBy(col("lang"), col("source"), col("len_decade"))
      .agg(count(lit(1)).as("gsize"))
    d.join(groups, Seq("lang", "source", "len_decade"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(concat(col("lang"), lit(":"), col("len_decade")))
          .as("n_groups"),
        sum(when(col("gsize") < AnonK, 1L).otherwise(0L)).as("n_below_k"),
        min(col("gsize")).as("min_group"),
        expr(s"(1000000 * sum(CASE WHEN gsize < $AnonK THEN 1 ELSE 0 END)) DIV count(1)")
          .as("risk_ppm"))
      .orderBy(col("source"))
  }

  // -------------------------------------------------------------------------
  // q215 — PII CO-OCCURRENCE audit: q144 counts each identifier class in
  // isolation; re-identification risk concentrates where classes CO-OCCUR
  // (an email AND a phone in one document is a linkable identity, not two
  // independent leaks — the compound-identifier escalation rule every
  // privacy review applies). Per source: the distribution of distinct PII
  // classes per doc (0..3) and the compound-risk count (≥ 2 classes).
  //
  // Scale: the same one codegen'd regex map as q144 + one partial-
  // aggregated groupBy(source) — scan-bound, ~6 longs per source shuffle.
  // -------------------------------------------------------------------------

  /** q215 — per source: docs by distinct-PII-class count + compound risk. */
  def q215PiiCooccurrence(spark: SparkSession, dir: String): DataFrame = {
    def has(pat: String): Column =
      when(size(regexp_extract_all(col("pii_text"), lit(pat), lit(0))) > 0, 1L)
        .otherwise(0L)
    piiTable(spark, dir)
      .select(col("source"),
        (has(emailPat) + has(phonePat) + has(ipPat)).as("k"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("k") === 0L, 1L).otherwise(0L)).as("docs_0"),
        sum(when(col("k") === 1L, 1L).otherwise(0L)).as("docs_1"),
        sum(when(col("k") === 2L, 1L).otherwise(0L)).as("docs_2"),
        sum(when(col("k") === 3L, 1L).otherwise(0L)).as("docs_3"),
        sum(when(col("k") >= 2L, 1L).otherwise(0L)).as("docs_compound"))
      .orderBy(col("source"))
  }

  val piiCooccurrenceOracle: String =
    piiCte + ",\n" + """k AS (
      |  SELECT source,
      |    (CASE WHEN len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN len(regexp_extract_all(pii_text, '\+1-[0-9]{3}-[0-9]{4}')) > 0 THEN 1 ELSE 0 END
      |     + CASE WHEN len(regexp_extract_all(pii_text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) > 0 THEN 1 ELSE 0 END) AS k
      |  FROM pii)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_0,
      |  CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS docs_1,
      |  CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS docs_2,
      |  CAST(sum(CASE WHEN k = 3 THEN 1 ELSE 0 END) AS BIGINT) AS docs_3,
      |  CAST(sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS docs_compound
      |FROM k GROUP BY source ORDER BY source""".stripMargin

  val kAnonymityOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, lang,
       |    CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) // 10
       |      AS len_decade
       |  FROM documents),
       |g AS (
       |  SELECT lang, source, len_decade, CAST(count(*) AS BIGINT) AS gsize
       |  FROM d GROUP BY lang, source, len_decade)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT d.lang || ':' || d.len_decade) AS BIGINT) AS n_groups,
       |  CAST(sum(CASE WHEN g.gsize < $AnonK THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_below_k,
       |  CAST(min(g.gsize) AS BIGINT) AS min_group,
       |  (1000000 * CAST(sum(CASE WHEN g.gsize < $AnonK THEN 1 ELSE 0 END) AS BIGINT))
       |    // CAST(count(*) AS BIGINT) AS risk_ppm
       |FROM d JOIN g ON g.lang = d.lang AND g.source = d.source
       |              AND g.len_decade = d.len_decade
       |GROUP BY d.source ORDER BY d.source""".stripMargin
}
