package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap detection + repair planning — the `fill`/`gaps` job (SURVEY §3.3:
  * chainweb-data exec/Chainweb/Gaps.hs:156-188 `getBlockGaps` + range
  * chunking Gaps.hs:82-91).
  *
  * The detection is one distributed window pass (W1: `lead` over
  * (chain, height)); only the RESULT — a tiny list of missing intervals —
  * is collected to the driver, where [[RangePlan]] turns it into ≤120-block
  * fetch requests. At 100 TB the window shuffles once on chainId and each
  * partition streams sorted heights; nothing else leaves the executors.
  */
object Gaps {

  /** Missing (chain, lo, hi) intervals: interior holes (between consecutive
    * ingested heights) plus the genesis-to-min prefix when absent. */
  def missingIntervals(blocks: DataFrame, chainCol: String, heightCol: String,
                       genesis: Map[Long, Long]): Seq[RangePlan.Range] = {
    val w = Window.partitionBy(col("cid")).orderBy(col("h"))
    val interior = blocks
      .select(col(chainCol).as("cid"), col(heightCol).as("h"))
      .withColumn("next_h", lead(col("h"), 1).over(w))
      .filter(col("next_h") - col("h") > 1)
      .select(col("cid"), (col("h") + 1).as("lo"), (col("next_h") - 1).as("hi"))
      .collect()
      .map(r => RangePlan.Range(r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val mins = blocks.groupBy(col(chainCol).as("cid"))
      .agg(min(col(heightCol)).as("mn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prefixes = genesis.toSeq.sorted.flatMap { case (cid, g) =>
      mins.get(cid) match {
        case Some(mn) if mn > g => Some(RangePlan.Range(cid, g, mn - 1))
        case None               => None // chain absent entirely → lookupPlan's job
        case _                  => None
      }
    }
    (interior ++ prefixes).sortBy(r => (r.chainId, r.lo))
  }

  /** Full repair plan: missing intervals chunked into fetch requests. */
  def plan(blocks: DataFrame, chainCol: String, heightCol: String,
           genesis: Map[Long, Long], chunk: Int = RangePlan.ChunkSize): Seq[RangePlan.Range] =
    missingIntervals(blocks, chainCol, heightCol, genesis)
      .flatMap(r => RangePlan.descChunks(r.chainId, r.lo, r.hi, chunk))

  /** Coinbase-gap detection on the EVENTS table — the `fill-events` job
    * (chainweb-data exec/Chainweb/FillEvents.hs:98-124 `getCoinbaseGaps`):
    * every block has a coinbase event, so a height absent from `events` is a
    * missing-events block. Same W1 lead window, but over the DISTINCT
    * (chain, height) pairs (events are many-per-height; dedup first keeps
    * the window input at block grain — the reference's window over raw
    * events tolerates duplicates because lead() skips equal heights with
    * gap 0, ours prunes them up front, shuffling block-grain rows only).
    * The per-chain prefix below `min(height)` down to `startingHeight` (the
    * events activation height) is included, as in `addStart`
    * (FillEvents.hs:110-118). Intervals here are INCLUSIVE [lo,hi] — the
    * reference's triples are exclusive bounds `(a, b)` whose fetch loop
    * nevertheless re-reads the boundary blocks (FillEvents.hs:81-84), so
    * the filled block set is identical. */
  def coinbaseGaps(events: DataFrame, chainCol: String, heightCol: String,
                   startingHeight: Long): Seq[RangePlan.Range] = {
    val perBlock = events
      .select(col(chainCol).as("cid"), col(heightCol).as("h"))
      .distinct()
    missingIntervals(perBlock, "cid", "h",
      genesis = perBlock.groupBy(col("cid")).agg(min(col("h")))
        .collect().map(r => r.getLong(0) -> startingHeight).toMap)
  }

  /** Transfers backfill plan — `backfill-transfers`
    * (chainweb-data exec/Chainweb/BackfillTransfers.hs:62-99): from the
    * events activation height up to the HIGHEST per-chain `min(height)` of
    * the transfers table, in descending ≤`chunk`-height windows (each
    * window is one multi-chain insert transaction in the reference; here,
    * one batch partition). Fails fast unless every chain has transfers
    * rows (BackfillTransfers.hs:64-67 `checkMinHeights`), and reports the
    * effective total of TRANSFER events to fill (progress denominator,
    * BackfillTransfers.hs:151-152).
    */
  final case class TransfersBackfill(windows: Seq[(Long, Long)], effectiveTotal: Long)

  def transfersBackfillPlan(transfers: DataFrame, events: DataFrame,
                            activationHeight: Long, numChains: Int,
                            chunk: Int = 200): TransfersBackfill = {
    val mins = transfers.groupBy(col("chainid"))
      .agg(min(col("height")).as("mn")).collect()
    require(mins.length == numChains,
      s"transfers table must have an entry for every chain id " +
      s"(${mins.length}/$numChains present)")
    val maxMin = mins.map(_.getLong(1)).max
    // rangeToDescGroupsOf chunkSize activation maxMin (Types.hs:94-99)
    val windows = RangePlan.descChunks(0L, activationHeight, maxMin, chunk)
      .map(r => (r.lo, r.hi))
    val total = events
      .filter(col("height") >= activationHeight && col("height") <= maxMin &&
              col("name") === "TRANSFER")
      .count()
    TransfersBackfill(windows, total)
  }
}
