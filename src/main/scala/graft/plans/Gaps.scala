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
}
