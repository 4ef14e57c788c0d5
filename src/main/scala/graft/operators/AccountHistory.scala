package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Account transfer history — the reference's `/txs/account/<acct>`
  * (SURVEY §7.1's first end-to-end milestone: U1 union of the two
  * account scans + O1 cursor ordering + J1 block decoration + J3
  * cross-chain resolution; chainweb-data lib/ChainwebDb/Queries.hs:251-339).
  *
  * Runs over the six tables produced by [[graft.ingest.Flatten]] /
  * [[graft.ingest.Upsert]]. Scale: the two account scans prune on the
  * account clustering (SURVEY §4 — two sorted projections mirroring the
  * reference's two indexes); the events join for x-chain resolution is an
  * equi-join on the (block, requestkey, idx) PK prefix, and blocks
  * decoration joins on hash — both co-keyed with the transfer row, no
  * fan-out.
  */
object AccountHistory {

  /** History rows for one account, newest first (height DESC, requestkey
    * DESC, idx ASC — Queries.hs:238-242), decorated with block time and
    * x-chain target resolution for empty counterparty accounts. */
  def transfersOf(spark: SparkSession, tableDir: String, account: String,
                  token: String = "coin"): DataFrame = {
    val transfers = spark.read.parquet(s"$tableDir/transfers")
      .filter(col("modulename") === token)
    val blocks = spark.read.parquet(s"$tableDir/blocks")
      .select(col("hash").as("block"), col("creationtime").as("block_time"))
    val events = spark.read.parquet(s"$tableDir/events")

    // U1 — union of the two indexed scans, not one OR predicate.
    val scans = transfers.filter(col("from_acct") === account)
      .unionAll(transfers.filter(col("to_acct") === account))

    // J3 — the adjacent TRANSFER_XCHAIN event (same block+requestkey,
    // idx-1) carries [sender, receiver, amount, targetChain] for an
    // outbound x-chain send whose TRANSFER row has an empty to_acct
    // (Queries.hs:291-339's lateral, as a plain left join).
    val xchain = events
      .filter(col("qualname").endsWith("TRANSFER_XCHAIN"))
      .select(col("block"), col("requestkey"), (col("idx") + 1).as("idx"),
              regexp_replace(element_at(col("params"), 2), "^\"|\"$", "")
                .as("x_target"),
              element_at(col("params"), 4).cast("long").as("x_chainid"))

    scans
      .join(blocks, "block")
      .join(xchain, Seq("block", "requestkey", "idx"), "left")
      .select(
        col("requestkey"), col("chainid"), col("height"), col("idx"),
        col("from_acct"),
        when(col("to_acct") === "" && col("x_target").isNotNull, col("x_target"))
          .otherwise(col("to_acct")).as("to_acct"),
        (col("to_acct") === "").as("cross_chain"),
        col("x_chainid").as("target_chainid"),
        col("amount"), col("block_time"))
      .orderBy(col("height").desc, col("requestkey").desc, col("idx").asc)
  }
}
