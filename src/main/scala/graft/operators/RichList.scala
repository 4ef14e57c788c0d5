package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Richlist pipeline (SURVEY §2.3 J6 / §2.4 A6 / §2.1 S8 / §2.10 X8 —
  * chainweb-data exec/Chainweb/RichList.hs): latest row per account key,
  * balance extracted by recursive JSON descent, top-100 by balance, CSV
  * sink.
  *
  * Scale: latest-per-key is one shuffle on the account key with a bounded
  * per-key window; the top-100 is a TakeOrdered (per-partition heaps, one
  * tiny merge) — no global sort materializes.
  */
object RichList {

  /** X8 — recursive descent for the first `"balance"` field anywhere in a
    * JSON document (RichList.hs:80-93 searches row data whose layout varies
    * by module). Jackson is Spark's own JSON runtime — no extra dep. */
  def balanceOf(json: String): Option[java.math.BigDecimal] = {
    def search(node: JsonNode): Option[JsonNode] =
      if (node == null) None
      else if (node.has("balance")) Some(node.get("balance"))
      else {
        val it = node.elements()
        var found: Option[JsonNode] = None
        while (found.isEmpty && it.hasNext) found = search(it.next())
        found
      }
    try search(new ObjectMapper().readTree(json)).collect {
      case n if n.isNumber => n.decimalValue()
      case n if n.isTextual && n.asText().nonEmpty => new java.math.BigDecimal(n.asText())
    } catch { case _: Exception => None }
  }

  val balanceUdf = udf(balanceOf _)

  /** Latest balance per (chain, account) then global top-N
    * (RichList.hs:95-120: `max(txid) GROUP BY rowkey` join + sort + take). */
  def topBalances(coinRows: DataFrame, n: Int = 100): DataFrame = {
    val w = Window.partitionBy(col("chainid"), col("rowkey"))
      .orderBy(col("txid").desc)
    coinRows
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("rowkey").as("account"),
              balanceUdf(col("data")).cast("decimal(38,12)").as("balance"))
      .groupBy(col("account")).agg(sum(col("balance")).as("balance"))
      .orderBy(col("balance").desc, col("account"))
      .limit(n)
  }

  /** S8 — CSV sink (RichList.hs:95-103 writes richlist.csv). */
  def writeCsv(top: DataFrame, path: String): Unit =
    top.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** The reference's per-chain SQL (RichList.hs:110-120
    * `richListQueryStmt`): latest row per account key, computed INSIDE the
    * chain database. Lower-case quoted aliases keep column names stable
    * across dialects (Derby/H2 upper-case unquoted labels; sqlite does
    * not). */
  def latestRowsSql(table: String): String =
    s"""SELECT coin.rowkey AS "rowkey", coin.txid AS "txid",
       |       coin.rowdata AS "data"
       |FROM $table coin
       |INNER JOIN (SELECT rowkey AS acct_id, max(txid) AS last_txid
       |            FROM $table GROUP BY rowkey) latest
       |ON coin.rowkey = latest.acct_id AND coin.txid = latest.last_txid""".stripMargin

  /** S7 — per-chain JDBC scan (RichList.hs:35-78 iterates the node's
    * per-chain `pact-v1-chain-<cid>.sqlite` files; here each chain is one
    * JDBC url, e.g. `jdbc:sqlite:/…/pact-v1-chain-0.sqlite`). The
    * latest-row-per-key aggregation is PUSHED DOWN as the JDBC query —
    * only the per-account latest rows ever cross the wire, exactly the
    * rows the reference's sqlite query returns. Chains union into the
    * `(chainid, rowkey, txid, data)` relation [[topBalances]] consumes;
    * each chain's read is an independent JDBC partition, so 20 chains
    * load with 20-way parallelism without any cross-DB coordination. */
  def coinRowsJdbc(spark: org.apache.spark.sql.SparkSession,
                   chainUrls: Map[Long, String],
                   table: String = "\"coin_coin-table\""): DataFrame = {
    require(chainUrls.nonEmpty, "no chain databases given")
    chainUrls.toSeq.sortBy(_._1).map { case (cid, url) =>
      spark.read.format("jdbc")
        .option("url", url)
        .option("query", latestRowsSql(table))
        .load()
        .select(lit(cid).as("chainid"), col("rowkey"),
                col("txid"), col("data"))
    }.reduce(_.unionByName(_))
  }

  /** End-to-end JDBC richlist: per-chain pushdown scan → [[topBalances]]. */
  def topBalancesJdbc(spark: org.apache.spark.sql.SparkSession,
                      chainUrls: Map[Long, String],
                      table: String = "\"coin_coin-table\"",
                      n: Int = 100): DataFrame =
    topBalances(coinRowsJdbc(spark, chainUrls, table), n)
}
