package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL / domain filtering over `documents` — the provenance-hygiene stage
  * of a web-scale curation pipeline (RefinedWeb, Penedo et al. 2023 §3.1:
  * URL blocklists run before any content heuristic).
  *
  * Like [[Pii]], the synthetic corpus carries no URLs, so [[urlTable]]
  * embeds deterministic doc_id-derived markers recomputed identically by
  * the oracle; the EXTRACTOR runs over the full text and Round5Spec pins
  * zero matches on the clean corpus. The blocklist is one shared Scala
  * literal ([[blockedDomains]]) rendered into BOTH the Spark broadcast
  * dimension and the oracle's VALUES list — one source of truth.
  *
  * Cross-engine notes: `regexp_extract_all(s, pat, 1)` group extraction
  * has identical semantics in Spark and DuckDB; the `^www\.` strip is an
  * anchored pattern (no lookaround); patterns stay in the Java ∩ RE2
  * subset.
  *
  * Scale: extraction is a codegen'd row-wise map; the explode emits one
  * narrow (source, doc_id, domain) row per URL — the text never travels
  * past the extract. The blocklist is a broadcast dimension (10 rows
  * here; real blocklists are ~1e6 rows — still broadcast range), so the
  * only shuffles are the two partial-aggregated groupBys.
  */
object UrlOps {

  /** Host-capture pattern: group 1 is the authority. */
  val urlPat = "https?://([A-Za-z0-9.-]+)/"

  /** The shared blocklist literal — five of each injected URL class. */
  val blockedDomains: Seq[String] =
    (0 until 50 by 10).map(k => s"site$k.com") ++
    (5 until 50 by 10).map(k => s"cdn.site$k.org")

  /** documents + deterministic URL tail: an https www-host on doc_id%4,
    * an http cdn-host on doc_id%6 (both moduli share docs with the PII
    * fixture's — multi-marker docs exist), 50 distinct sites each. */
  /** The injected tail alone (composable — funnel v3 stacks it with
    * [[Pii.piiTail]]); `d` is the doc_id column. */
  def urlTail(d: Column): Column = {
    def s(c: Column) = c.cast("string")
    concat(
      when(d % 4 === 0, concat(lit(" see https://www.site"), s(d % 50),
                               lit(".com/p/"), s(d))).otherwise(""),
      when(d % 6 === 0, concat(lit(" ref http://cdn.site"), s(d % 50),
                               lit(".org/a"), s(d), lit(".html"))).otherwise(""))
  }

  /** The SQL twin of [[urlTail]]. */
  val urlTailSql: String =
    """CASE WHEN doc_id % 4 = 0 THEN ' see https://www.site' || (doc_id % 50) || '.com/p/' || doc_id ELSE '' END
      || CASE WHEN doc_id % 6 = 0 THEN ' ref http://cdn.site' || (doc_id % 50) || '.org/a' || doc_id || '.html' ELSE '' END"""

  def urlTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      concat(col("text"), urlTail(col("doc_id"))).as("url_text"))

  /** q148 — per-source URL triage: doc/url counts, blocklist hits, and
    * distinct-domain fan-out (the crawl-mix readout that decides which
    * sources need domain-level review). */
  def q148UrlBlocklist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = urlTable(spark, dir)
    val hosts = base.select(col("source"), col("doc_id"),
        explode(regexp_extract_all(col("url_text"), lit(urlPat), lit(1))).as("host"))
      .withColumn("domain", regexp_replace(col("host"), "^www\\.", ""))
    val block = broadcast(blockedDomains.toDF("domain")
      .withColumn("is_blocked", lit(1L)))
    val perDoc = hosts.join(block, Seq("domain"), "left")
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_urls"),
        sum(coalesce(col("is_blocked"), lit(0L))).as("n_blocked"))
    val domains = hosts.join(block, Seq("domain"), "left")
      .groupBy(col("source"))
      .agg(countDistinct(col("domain")).as("n_domains"),
        countDistinct(when(col("is_blocked") === 1L, col("domain"))).as("n_blocked_domains"))
    base.select(col("source"), col("doc_id"))
      .join(perDoc, Seq("source", "doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(coalesce(col("n_urls"), lit(0L)) > 0, 1L).otherwise(0L)).as("docs_with_url"),
        sum(when(coalesce(col("n_blocked"), lit(0L)) > 0, 1L).otherwise(0L)).as("docs_blocked"),
        sum(coalesce(col("n_urls"), lit(0L))).as("total_urls"),
        sum(coalesce(col("n_blocked"), lit(0L))).as("blocked_urls"))
      .join(domains, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("docs_with_url"),
        col("docs_blocked"), col("total_urls"), col("blocked_urls"),
        coalesce(col("n_domains"), lit(0L)).as("n_domains"),
        coalesce(col("n_blocked_domains"), lit(0L)).as("n_blocked_domains"))
      .orderBy(col("source"))
  }

  // -------------------------------------------------------------------------
  // q164 — URL CANONICALIZATION dedup (RefinedWeb §3.1 runs URL-level
  // dedup before any content pass): scheme / `www.` / query / fragment /
  // trailing-slash variants of the same resource collapse to one
  // canonical key, and the per-source collapse count is the crawl-
  // redundancy readout. The q148 tail's URLs are all distinct under
  // canonicalization (each embeds its doc_id in the path), so a second
  // deterministic tail supplies the variants: classes d%3∈{0,1} emit the
  // SAME /page/{d%20} resource behind different scheme/www/query/
  // fragment dressing — collapse is guaranteed by construction and
  // recomputed identically by the oracle.
  // -------------------------------------------------------------------------

  /** Variant tail: two URL dressings of one shared resource pool. */
  def urlDupTail(d: Column): Column = {
    def s(c: Column) = c.cast("string")
    concat(
      when(d % 3 === 0, concat(lit(" also https://www.site"), s(d % 10),
        lit(".com/page/"), s(d % 20), lit("?ref="), s(d))).otherwise(""),
      when(d % 3 === 1, concat(lit(" also http://site"), s(d % 10),
        lit(".com/page/"), s(d % 20), lit("#s"), s(d % 7))).otherwise(""))
  }

  /** The SQL twin of [[urlDupTail]]. */
  val urlDupTailSql: String =
    """CASE WHEN doc_id % 3 = 0 THEN ' also https://www.site' || (doc_id % 10) || '.com/page/' || (doc_id % 20) || '?ref=' || doc_id ELSE '' END
      || CASE WHEN doc_id % 3 = 1 THEN ' also http://site' || (doc_id % 10) || '.com/page/' || (doc_id % 20) || '#s' || (doc_id % 7) ELSE '' END"""

  /** Full-URL capture (group 0): the injected URLs are space-delimited. */
  val fullUrlPat = "https?://[^ ]+"

  /** The canonicalization chain — four anchored/suffix regex rewrites in
    * the Java ∩ RE2 subset, applied in both engines in the same order:
    * strip scheme, strip leading `www.`, cut query+fragment, cut the
    * trailing slash. */
  def canonicalize(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(url, "^https?://", ""),
          "^www\\.", ""),
        "[?#].*$", ""),
      "/$", "")

  /** q164 — per-source URL dedup triage: raw URL volume, distinct raw
    * URLs, distinct canonical URLs, and the collapse count — the
    * redundancy a URL-level dedup pass would remove before fetch.
    *
    * Scale: extraction + canonicalization is one codegen'd row-wise map;
    * past it every row is (source, url) — two countDistinct aggregates
    * (two-phase exchanges on 32-to-80-byte keys), no joins. */
  def q164UrlCanonDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      concat(col("text"), urlTail(col("doc_id")), urlDupTail(col("doc_id")))
        .as("url_text"))
    val urls = base.select(col("source"),
        explode(regexp_extract_all(col("url_text"), lit(fullUrlPat), lit(0)))
          .as("url"))
      .withColumn("canon", canonicalize(col("url")))
    urls.groupBy(col("source"))
      .agg(count(lit(1)).as("n_urls"),
           countDistinct(col("url")).as("distinct_raw"),
           countDistinct(col("canon")).as("distinct_canon"))
      .withColumn("collapsed", col("distinct_raw") - col("distinct_canon"))
      .orderBy(col("source"))
  }

  val urlCanonDedupOracle: String = {
    // flatten the tail SQL to one line: stripMargin below would otherwise
    // eat one pipe of an interpolated line-leading `||`
    def flat(sql: String) = sql.linesIterator.map(_.trim).mkString(" ")
    s"""WITH base AS (
       |  SELECT source,
       |    text || ${flat(urlTailSql)} || ${flat(urlDupTailSql)} AS url_text
       |  FROM documents),
       |urls AS (
       |  SELECT source, unnest(regexp_extract_all(url_text, '$fullUrlPat'))
       |    AS url
       |  FROM base),
       |canon AS (
       |  SELECT source, url,
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(
       |          regexp_replace(url, '^https?://', ''),
       |          '^www\\.', ''),
       |        '[?#].*$$', ''),
       |      '/$$', '') AS canon
       |  FROM urls)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_urls,
       |  CAST(count(DISTINCT url) AS BIGINT) AS distinct_raw,
       |  CAST(count(DISTINCT canon) AS BIGINT) AS distinct_canon,
       |  CAST(count(DISTINCT url) - count(DISTINCT canon) AS BIGINT)
       |    AS collapsed
       |FROM canon GROUP BY source ORDER BY source""".stripMargin
  }

  // -------------------------------------------------------------------------
  // q152 — domain PageRank over the source↔domain provenance graph
  // -------------------------------------------------------------------------

  /** PageRank damping factor in ppm (d = 0.85). */
  val DampPpm = 850000L

  /** Fixed iteration count — the q146 bounded-iteration discipline: the
    * oracle re-runs the same 8 steps as a generated CTE chain. */
  val PrIters = 8

  /** q152 — PageRank over the bipartite source↔domain graph (nodes =
    * crawl sources and extracted domains, edge weight = number of docs of
    * that source citing that domain): the domain-authority signal a
    * curation pipeline uses to rank crawl frontiers (the harmonic-
    * centrality role in Common Crawl's ranking; RefinedWeb §3.1 uses the
    * inverse as a spam prior).
    *
    * Determinism is the q150/q134 integer-ppm rule: mass lives in ppm
    * units (Σ pr₀ = 10⁶), every division is one truncating integral DIV
    * per edge — order-independent, so a 1000-way parallel sum and the
    * oracle's single-threaded sum agree bit-exactly. Per-edge truncation
    * leaks ≤ 1 ppm per edge per round (Round5bSpec pins the envelope).
    *
    * Scale: the ITERATED state is one row per node — the vertex
    * dimension, never the corpus. Each round is two keyed shuffles
    * (contrib groupBy dst, pr rebuild join), the q42-CC loop shape, with
    * `localCheckpoint` cutting the 8-deep lineage. Edge weights come from
    * one partial-aggregated groupBy of the narrow (source, doc, domain)
    * extraction — the text never enters the loop. */
  def q152DomainPagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hosts = urlTable(spark, dir)
      .select(col("source"), col("doc_id"),
        explode(regexp_extract_all(col("url_text"), lit(urlPat), lit(1))).as("host"))
      .select(col("source"), col("doc_id"),
        regexp_replace(col("host"), "^www\\.", "").as("domain"))
      .distinct()
    val edges = hosts
      .groupBy(concat(lit("src:"), col("source")).as("u"),
               concat(lit("dom:"), col("domain")).as("v"))
      .agg(count(lit(1)).as("w"))
    val bi = edges.select(col("u"), col("v"), col("w"))
      .union(edges.select(col("v").as("u"), col("u").as("v"), col("w")))
      .localCheckpoint()
    val biDeg = bi.join(
      bi.groupBy(col("u")).agg(sum(col("w")).as("wdeg")), "u")
      .localCheckpoint()
    val nodes = bi.select(col("u")).distinct().localCheckpoint()
    // control scalars (vertex-dimension bounded, the q150 N pattern)
    val n = nodes.count()
    val base = 150000L / n // truncating, == SQL DIV for positives
    var pr = nodes.withColumn("pr", lit(1000000L / n))
    for (_ <- 1 to PrIters) {
      val contrib = biDeg.join(pr, "u")
        .select(col("v"), expr(
          s"CAST(CAST(pr AS DECIMAL(38,0)) * $DampPpm * w DIV (1000000L * wdeg) AS BIGINT)")
          .as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, nodes("u") === contrib("v"), "left")
        .select(nodes("u"), (lit(base) + coalesce(col("s"), lit(0L))).as("pr"))
        .localCheckpoint()
    }
    pr.select(col("u").as("node"), col("pr").as("pr_ppm"))
      .orderBy(col("node"))
  }

  /** q156 — domain QUALITY triage, the blocklist-candidate generator: for
    * every extracted domain, how many docs/sources cite it and the average
    * quality (q35's score) of those docs — the readout that turns a
    * content signal into a PROVENANCE rule (RefinedWeb §3.1's motivation:
    * a domain whose citations are uniformly low-quality gets blocked once,
    * instead of re-scoring its pages forever).
    *
    * Float discipline: q35's r6-rounded quality is converted to integer
    * ppm per doc (`round(quality * 1e6)` recovers the exact integer both
    * engines already agree on — the multiply's fp error is ≪ 0.5), so the
    * per-domain average is an exact integer sum + one integral DIV: no
    * double summation order anywhere.
    *
    * Scale: (doc, domain) rows join quality by doc_id (narrow ids), one
    * partial-aggregated groupBy(domain); the blocklist is the q148
    * broadcast dimension. */
  def q156DomainQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hosts = urlTable(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(regexp_extract_all(col("url_text"), lit(urlPat), lit(1))).as("host"))
      .select(col("doc_id"), col("source"),
        regexp_replace(col("host"), "^www\\.", "").as("domain"))
      .distinct()
    val qual = TextOps.q35QualityScore(spark, dir)
      .select(col("doc_id"),
        expr("CAST(round(quality * 1000000.0) AS BIGINT)").as("q_ppm"))
    val block = broadcast(blockedDomains.toDF("domain")
      .withColumn("is_blocked", lit(1L)))
    hosts.join(qual, "doc_id")
      .groupBy(col("domain"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
           countDistinct(col("source")).as("n_sources"),
           sum(col("q_ppm")).as("sum_q_ppm"),
           min(col("q_ppm")).as("min_q_ppm"))
      .join(block, Seq("domain"), "left")
      .select(col("domain"), col("n_docs"), col("n_sources"),
        expr("sum_q_ppm DIV n_docs").as("avg_q_ppm"),
        col("min_q_ppm"),
        coalesce(col("is_blocked"), lit(0L)).as("is_blocked"))
      .orderBy(col("domain"))
  }

  val domainQualityOracle: String = {
    val values = blockedDomains.map(d => s"('$d')").mkString(", ")
    """WITH urls AS (
      |  SELECT doc_id, source,
      |    text
      |    || CASE WHEN doc_id % 4 = 0 THEN ' see https://www.site' || (doc_id % 50) || '.com/p/' || doc_id ELSE '' END
      |    || CASE WHEN doc_id % 6 = 0 THEN ' ref http://cdn.site' || (doc_id % 50) || '.org/a' || doc_id || '.html' ELSE '' END
      |    AS url_text
      |  FROM documents),
      |hosts AS (
      |  SELECT DISTINCT doc_id, source,
      |    regexp_replace(unnest(regexp_extract_all(url_text, 'https?://([A-Za-z0-9.-]+)/', 1)),
      |                   '^www\.', '') AS domain
      |  FROM urls),
      |qual AS (
      |  SELECT doc_id, CAST(round(quality * 1000000.0) AS BIGINT) AS q_ppm
      |  FROM (""".stripMargin + "\n" +
    TextOps.qualityOracle.replace("ORDER BY doc_id", "") + ")),\n" +
    s"block(domain) AS (VALUES $values)\n" +
    """SELECT h.domain,
      |  CAST(count(DISTINCT h.doc_id) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT h.source) AS BIGINT) AS n_sources,
      |  CAST(sum(q.q_ppm) // count(DISTINCT h.doc_id) AS BIGINT) AS avg_q_ppm,
      |  CAST(min(q.q_ppm) AS BIGINT) AS min_q_ppm,
      |  CAST(CASE WHEN any_value(b.domain) IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_blocked
      |FROM hosts h
      |JOIN qual q ON h.doc_id = q.doc_id
      |LEFT JOIN block b ON h.domain = b.domain
      |GROUP BY h.domain ORDER BY h.domain""".stripMargin
  }

  /** Generated 8-step CTE replay — the oracle RE-RUNS PageRank from
    * scratch (q146's discipline: nothing is dumped from the Spark run). */
  val domainPagerankOracle: String = {
    val iters = (0 until PrIters).map { k =>
      s"""c$k AS (
         |  SELECT bi.v AS u,
         |    CAST(sum(CAST(p.pr AS HUGEINT) * $DampPpm * bi.w
         |             // (1000000 * d.wdeg)) AS BIGINT) AS s
         |  FROM bi JOIN pr$k p ON bi.u = p.u JOIN deg d ON bi.u = d.u
         |  GROUP BY bi.v),
         |pr${k + 1} AS (
         |  SELECT n.u,
         |    CAST((SELECT 150000 // n FROM nn) + coalesce(c.s, 0) AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN c$k c ON n.u = c.u)""".stripMargin
    }.mkString(",\n")
    """WITH urls AS (
      |  SELECT doc_id, source,
      |    text
      |    || CASE WHEN doc_id % 4 = 0 THEN ' see https://www.site' || (doc_id % 50) || '.com/p/' || doc_id ELSE '' END
      |    || CASE WHEN doc_id % 6 = 0 THEN ' ref http://cdn.site' || (doc_id % 50) || '.org/a' || doc_id || '.html' ELSE '' END
      |    AS url_text
      |  FROM documents),
      |hosts AS (
      |  SELECT DISTINCT source, doc_id,
      |    regexp_replace(unnest(regexp_extract_all(url_text, 'https?://([A-Za-z0-9.-]+)/', 1)),
      |                   '^www\.', '') AS domain
      |  FROM urls),
      |edges AS (
      |  SELECT 'src:' || source AS u, 'dom:' || domain AS v, count(*) AS w
      |  FROM hosts GROUP BY 1, 2),
      |bi AS (SELECT u, v, w FROM edges UNION ALL SELECT v, u, w FROM edges),
      |deg AS (SELECT u, sum(w) AS wdeg FROM bi GROUP BY u),
      |nodes AS (SELECT DISTINCT u FROM bi),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |pr0 AS (SELECT u, CAST((SELECT 1000000 // n FROM nn) AS BIGINT) AS pr
      |        FROM nodes),""".stripMargin + "\n" + iters + "\n" +
    s"""SELECT u AS node, pr AS pr_ppm FROM pr$PrIters ORDER BY node"""
  }

  val urlBlocklistOracle: String = {
    val values = blockedDomains.map(d => s"('$d')").mkString(", ")
    """WITH urls AS (
      |  SELECT doc_id, source,
      |    text
      |    || CASE WHEN doc_id % 4 = 0 THEN ' see https://www.site' || (doc_id % 50) || '.com/p/' || doc_id ELSE '' END
      |    || CASE WHEN doc_id % 6 = 0 THEN ' ref http://cdn.site' || (doc_id % 50) || '.org/a' || doc_id || '.html' ELSE '' END
      |    AS url_text
      |  FROM documents),
      |hosts AS (
      |  SELECT source, doc_id,
      |    regexp_replace(unnest(regexp_extract_all(url_text, 'https?://([A-Za-z0-9.-]+)/', 1)),
      |                   '^www\.', '') AS domain
      |  FROM urls),""".stripMargin + "\n" +
    s"block(domain) AS (VALUES $values),\n" +
    """marked AS (
      |  SELECT h.source, h.doc_id, h.domain,
      |    CASE WHEN b.domain IS NULL THEN 0 ELSE 1 END AS is_blocked
      |  FROM hosts h LEFT JOIN block b ON h.domain = b.domain),
      |per_doc AS (
      |  SELECT source, doc_id, count(*) AS n_urls, sum(is_blocked) AS n_blocked
      |  FROM marked GROUP BY source, doc_id),
      |per_src AS (
      |  SELECT source, count(DISTINCT domain) AS n_domains,
      |    count(DISTINCT CASE WHEN is_blocked = 1 THEN domain END) AS n_blocked_domains
      |  FROM marked GROUP BY source)
      |SELECT u.source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN coalesce(p.n_urls, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_url,
      |  CAST(sum(CASE WHEN coalesce(p.n_blocked, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_blocked,
      |  CAST(sum(coalesce(p.n_urls, 0)) AS BIGINT) AS total_urls,
      |  CAST(sum(coalesce(p.n_blocked, 0)) AS BIGINT) AS blocked_urls,
      |  CAST(coalesce(any_value(s.n_domains), 0) AS BIGINT) AS n_domains,
      |  CAST(coalesce(any_value(s.n_blocked_domains), 0) AS BIGINT) AS n_blocked_domains
      |FROM urls u
      |LEFT JOIN per_doc p ON u.source = p.source AND u.doc_id = p.doc_id
      |LEFT JOIN per_src s ON u.source = s.source
      |GROUP BY u.source ORDER BY u.source""".stripMargin
  }
}
