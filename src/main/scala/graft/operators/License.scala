package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** License-marker tagging over `documents` — the compliance pass every
  * code/web corpus runs before training: docs carrying permissive markers
  * (MIT, Apache-2.0) are routed differently from copyleft (GPL), and
  * untagged docs fall to the source-level default. Detection is marker-
  * phrase containment over the full text — the same class of scan
  * (LIKE containment, P3/F1) the reference's code search runs
  * (haskell-src/lib/ChainwebDb/Queries.hs:158-160), pointed at the
  * canonical license sentinel phrases instead of Pact code.
  *
  * The synthetic corpus is license-free prose, so — the [[CodeDetect]] /
  * [[Pii]] fixture pattern — [[licenseTable]] appends deterministic
  * license tails derived from `doc_id` arithmetic (moduli 7/13/17, all
  * coprime to the source stride so every source sees every class, with
  * overlaps producing multi-licensed docs). The DETECTOR scans real text
  * plus tail; real prose must contribute zero hits.
  *
  * Scale: one codegen'd row-wise containment test per marker plus one
  * partial-aggregated `groupBy(source)` — the shuffle carries six longs
  * per source; at 100 TB the cost is the scan. */
object License {

  /** Marker phrases: the legally-canonical sentinel line of each family
    * (every MIT text contains the grant line; every Apache-2.0 its name;
    * every GPL variant the "general public license" phrase). */
  val MitMarker = "permission is hereby granted"
  val ApacheMarker = "apache license"
  val GplMarker = "general public license"

  /** Deterministic license tails (doc_id % 7 → MIT, % 13 → Apache-2.0,
    * % 17 → GPL; 91/119/221-multiples carry two, 1547-multiples all
    * three). */
  def licenseTail(d: Column): Column = concat(
    when(d % 7 === 0,
      lit(" spdx license identifier mit permission is hereby granted free of charge"))
      .otherwise(""),
    when(d % 13 === 0,
      lit(" licensed under the apache license version 2.0 you may not use this file"))
      .otherwise(""),
    when(d % 17 === 0,
      lit(" gnu general public license as published by the free software foundation"))
      .otherwise(""))

  /** The SQL twin of [[licenseTail]] — ONE line (stripMargin would eat a
    * leading pipe on continuation lines). */
  val licenseTailSql: String =
    "CASE WHEN doc_id % 7 = 0 THEN ' spdx license identifier mit permission is hereby granted free of charge' ELSE '' END || " +
    "CASE WHEN doc_id % 13 = 0 THEN ' licensed under the apache license version 2.0 you may not use this file' ELSE '' END || " +
    "CASE WHEN doc_id % 17 = 0 THEN ' gnu general public license as published by the free software foundation' ELSE '' END"

  def licenseTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      lower(concat(col("text"), licenseTail(col("doc_id")))).as("lt"))

  /** q255 — per-source license census: docs per class, multi-licensed
    * docs (conflict review queue), and untagged docs (fall to the source
    * default policy). */
  def q255LicenseTag(spark: SparkSession, dir: String): DataFrame = {
    val mit = when(col("lt").contains(MitMarker), 1L).otherwise(0L)
    val apache = when(col("lt").contains(ApacheMarker), 1L).otherwise(0L)
    val gpl = when(col("lt").contains(GplMarker), 1L).otherwise(0L)
    licenseTable(spark, dir)
      .select(col("source"), mit.as("mit"), apache.as("apache"), gpl.as("gpl"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("mit")).as("n_mit"),
           sum(col("apache")).as("n_apache"),
           sum(col("gpl")).as("n_gpl"),
           sum(when(col("mit") + col("apache") + col("gpl") > 1, 1L)
                 .otherwise(0L)).as("n_multi"),
           sum(when(col("mit") + col("apache") + col("gpl") === 0, 1L)
                 .otherwise(0L)).as("n_untagged"))
      .orderBy(col("source"))
  }

  val licenseTagOracle: String =
    s"""WITH c AS (
       |  SELECT doc_id, source, lower(text || $licenseTailSql) AS lt
       |  FROM documents),
       |m AS (
       |  SELECT source,
       |    CASE WHEN lt LIKE '%$MitMarker%' THEN 1 ELSE 0 END AS mit,
       |    CASE WHEN lt LIKE '%$ApacheMarker%' THEN 1 ELSE 0 END AS apache,
       |    CASE WHEN lt LIKE '%$GplMarker%' THEN 1 ELSE 0 END AS gpl
       |  FROM c)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(mit) AS BIGINT) AS n_mit,
       |  CAST(sum(apache) AS BIGINT) AS n_apache,
       |  CAST(sum(gpl) AS BIGINT) AS n_gpl,
       |  CAST(sum(CASE WHEN mit + apache + gpl > 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_multi,
       |  CAST(sum(CASE WHEN mit + apache + gpl = 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_untagged
       |FROM m GROUP BY source ORDER BY source""".stripMargin
}
