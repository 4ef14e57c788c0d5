package graft.plans

import graft.operators.RichList
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scheduled maintenance — the reference's daily `scheduledUpdates` thread
  * (SURVEY §3.2: chainweb-data exec/Chainweb/Server.hs:184-210 recomputes
  * coin supply + richlist and runs the gap fill every 24h). One idempotent
  * batch entry point over the ingested tables; scheduling is the caller's
  * concern (cron/airflow), matching the reference's design where lateness
  * is repaired offline (T2), not by stream state.
  */
object Maintenance {

  final case class Report(gapChunks: Int, richlistRows: Long,
                          totalSupply: java.math.BigDecimal,
                          txCount: Long = 0L, maxHeight: Long = 0L,
                          scheduleSupply: java.math.BigDecimal = java.math.BigDecimal.ZERO)

  /** Account balances from the transfers ledger: credits − debits.
    * Two |accounts|-sized aggregates + one outer join — no window over the
    * ledger itself, so it scales with distinct accounts, not transfers. */
  def balancesFromTransfers(transfers: DataFrame): DataFrame = {
    val dec = DecimalType(38, 12)
    val credits = transfers.groupBy(col("to_acct").as("account"))
      .agg(sum(col("amount").cast(dec)).as("credit"))
    val debits = transfers.groupBy(col("from_acct").as("account"))
      .agg(sum(col("amount").cast(dec)).as("debit"))
    credits.join(debits, Seq("account"), "full_outer")
      .select(col("account"),
              (coalesce(col("credit"), lit(0).cast(dec)) -
               coalesce(col("debit"), lit(0).cast(dec))).as("balance"))
      .filter(col("account") =!= "")
  }

  /** Run the maintenance pass: gap repair plan + richlist CSV + supply. */
  def run(spark: SparkSession, tableDir: String, outDir: String,
          genesis: Map[Long, Long]): Report = {
    val blocks = spark.read.parquet(s"$tableDir/blocks")
    val transfers = spark.read.parquet(s"$tableDir/transfers")

    val plan = Gaps.plan(blocks, "chainid", "height", genesis)

    val top = balancesFromTransfers(transfers)
      .orderBy(col("balance").desc, col("account"))
      .limit(100)
    RichList.writeCsv(top, s"$outDir/richlist")

    val supply = transfers.filter(col("from_acct") === "") // coinbase mints
      .agg(coalesce(sum(col("amount")), lit(0).cast(DecimalType(38, 12))))
      .collect().head.getDecimal(0)

    // Stats cache for the serving tier (/stats O(1) — the reference's
    // reltuples-estimate semantics: refreshed once per maintenance cycle,
    // never computed per request). The schedule supply is the REAL
    // embedded-CSV computation (Coins.hs:118-120) at the current top.
    val txCount = spark.read.parquet(s"$tableDir/transactions").count()
    val maxH = blocks.agg(coalesce(max(col("height")), lit(0L)))
      .collect().head.getLong(0)
    val schedule = graft.operators.Coins.circulatingCoins(maxH)
    new java.io.File(outDir).mkdirs()
    // exactly the ChainwebDataStats field set (served verbatim by /stats)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/stats.json"),
      s"""{"transactionCount":$txCount,"coinsInCirculation":$schedule}""")

    Report(plan.size, top.count(), supply, txCount, maxH, schedule)
  }
}
