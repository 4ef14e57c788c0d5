package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q181 — the per-source DATASET CARD: one row per source rolling up the
  * library's hygiene and shape signals side by side — token mass, quality,
  * length dispersion, lexicon/PII/URL screening, duplicate burden. This is
  * the "datasheet for datasets" artifact (Gebru et al. CACM'21) a curation
  * team publishes with a release, and it is deliberately COMPOSED from the
  * library's own operators (q178's Gini, q166's lexicon triage, q148's URL
  * triage, q35's quality, q144's PII patterns) rather than re-derived — the
  * card IS the library's public face.
  *
  * Each metric is computed on the table its operator family defines (PII on
  * the PII-tailed text, lexicon on the lexicon-tailed text, URL on the
  * URL-tailed text, quality/lengths/dups on the raw corpus) — the same
  * contract as the underlying queries.
  *
  * Scale: every input relation is a per-source (≤ |sources|-row) aggregate;
  * the joins are dimension joins. The heavy lifting happens in the
  * composed operators, each already shaped for 100 TB.
  */
object DataCard {

  def q181DataCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // raw-corpus legs: quality average (exact ppm), duplicate members
    val qual = TextOps.q35QualityScore(spark, dir)
      .select(col("doc_id"),
        expr("CAST(round(quality * 1000000.0) AS BIGINT)").as("q_ppm"))
    val qualBySrc = docs.select(col("doc_id"), col("source")).join(qual, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("nq"), sum(col("q_ppm")).as("sum_q"))
      .select(col("source"), expr("sum_q DIV nq").as("avg_quality_ppm"))
    val dupGroups = docs.groupBy(md5(col("text")).as("k"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
    val dups = docs.select(col("source"), md5(col("text")).as("k"))
      .join(dupGroups, "k")
      .groupBy(col("source")).agg(count(lit(1)).as("n_dup_docs"))
    // library-operator legs (each on its own family table)
    val gini = TextOps.q178LengthGini(spark, dir)
      .select(col("source"), col("n_docs"), col("total_tokens"), col("gini_ppm"))
    val lex = Lexicon.q166LexiconFilter(spark, dir)
      .select(col("source"), col("docs_flagged").as("docs_lex_flagged"))
    val url = UrlOps.q148UrlBlocklist(spark, dir)
      .select(col("source"), col("docs_blocked").as("docs_url_blocked"))
    val pii = Pii.piiTable(spark, dir)
      .select(col("source"),
        (size(regexp_extract_all(col("pii_text"), lit(Pii.emailPat), lit(0))) +
         size(regexp_extract_all(col("pii_text"), lit(Pii.phonePat), lit(0))) +
         size(regexp_extract_all(col("pii_text"), lit(Pii.ipPat), lit(0))))
          .cast("long").as("n_pii"))
      .groupBy(col("source"))
      .agg(sum(when(col("n_pii") > 0, 1L).otherwise(0L)).as("docs_pii"))
    gini
      .join(qualBySrc, "source")
      .join(lex, "source")
      .join(pii, "source")
      .join(url, "source")
      .join(dups, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("avg_quality_ppm"), col("gini_ppm"), col("docs_lex_flagged"),
        col("docs_pii"), col("docs_url_blocked"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"))
      .orderBy(col("source"))
  }

  val dataCardOracle: String = {
    val lexIn = Lexicon.lexicon.map(t => s"'$t'").mkString(", ")
    val blockVals = UrlOps.blockedDomains.map(d => s"('$d')").mkString(", ")
    s"""WITH qual AS (
       |  SELECT doc_id, CAST(round(quality * 1000000.0) AS BIGINT) AS q_ppm
       |  FROM (${TextOps.qualityOracle})),
       |qsrc AS (
       |  SELECT d.source,
       |    CAST(sum(q.q_ppm) AS BIGINT) // CAST(count(*) AS BIGINT) AS avg_quality_ppm
       |  FROM documents d JOIN qual q USING (doc_id) GROUP BY d.source),
       |hist AS (
       |  SELECT source, len, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT source,
       |      CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS len
       |    FROM documents)
       |  GROUP BY source, len),
       |ranked AS (
       |  SELECT *, coalesce(sum(c) OVER (PARTITION BY source ORDER BY len
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
       |  FROM hist),
       |gini AS (
       |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
       |    CAST(sum(len * c) AS BIGINT) AS total_tokens,
       |    (1000000 * (CAST(sum(len * c * (2 * b + c)) AS BIGINT)
       |       - CAST(sum(c) AS BIGINT) * CAST(sum(len * c) AS BIGINT)))
       |      // (CAST(sum(c) AS BIGINT) * CAST(sum(len * c) AS BIGINT)) AS gini_ppm
       |  FROM ranked GROUP BY source),
       |lexed AS (
       |  SELECT doc_id, source, text || ${Lexicon.lexTailSql} AS lex_text
       |  FROM documents),
       |lex AS (
       |  SELECT source, CAST(sum(CASE WHEN len(list_filter(
       |      regexp_split_to_array(lower(lex_text), '\\s+'),
       |      x -> x IN ($lexIn))) > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS docs_lex_flagged
       |  FROM lexed GROUP BY source),
       |pii AS (
       |  SELECT source, CAST(sum(CASE WHEN
       |      len(regexp_extract_all(pii_text, '${Pii.emailPat}', 0)) +
       |      len(regexp_extract_all(pii_text, '${Pii.phonePat}', 0)) +
       |      len(regexp_extract_all(pii_text, '${Pii.ipPat}', 0)) > 0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS docs_pii
       |  FROM (SELECT source, text || ${Pii.piiTailSql.linesIterator.map(_.trim).mkString(" ")} AS pii_text FROM documents)
       |  GROUP BY source),
       |urls AS (
       |  SELECT doc_id, source,
       |    text || ${UrlOps.urlTailSql.linesIterator.map(_.trim).mkString(" ")} AS url_text
       |  FROM documents),
       |block(domain) AS (VALUES $blockVals),
       |hosts AS (
       |  SELECT doc_id, source,
       |    regexp_replace(unnest(regexp_extract_all(url_text, '${UrlOps.urlPat}', 1)),
       |                   '^www\\.', '') AS domain
       |  FROM urls),
       |urlflag AS (
       |  SELECT u.source,
       |    CAST(count(DISTINCT CASE WHEN b.domain IS NOT NULL THEN h.doc_id END)
       |         AS BIGINT) AS docs_url_blocked
       |  FROM urls u
       |  LEFT JOIN hosts h ON h.doc_id = u.doc_id
       |  LEFT JOIN block b ON b.domain = h.domain
       |  GROUP BY u.source),
       |dupg AS (
       |  SELECT md5(text) AS k, count(*) AS cnt FROM documents
       |  GROUP BY md5(text) HAVING count(*) > 1),
       |dups AS (
       |  SELECT d.source, CAST(count(*) AS BIGINT) AS n_dup_docs
       |  FROM documents d JOIN dupg g ON md5(d.text) = g.k
       |  GROUP BY d.source)
       |SELECT g.source, g.n_docs, g.total_tokens, q.avg_quality_ppm,
       |  g.gini_ppm, l.docs_lex_flagged, p.docs_pii, u.docs_url_blocked,
       |  coalesce(dp.n_dup_docs, 0) AS n_dup_docs
       |FROM gini g
       |JOIN qsrc q USING (source)
       |JOIN lex l USING (source)
       |JOIN pii p USING (source)
       |JOIN urlflag u USING (source)
       |LEFT JOIN dups dp USING (source)
       |ORDER BY g.source""".stripMargin
  }
}
