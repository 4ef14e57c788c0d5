package graft.plans

/** Range planning for backfill/gap repair — pure driver-side logic
  * (SURVEY §2.6 O8: chainweb-data lib/ChainwebData/Types.hs:94-99
  * `rangeToDescGroupsOf`, lib/ChainwebData/Backfill.hs:19-48 genesis-aware
  * `lookupPlan`). The output list becomes the partition list of the batch
  * fetch job (§3.3): each range is one node request of ≤ `chunk` blocks.
  */
object RangePlan {

  /** Inclusive height range on one chain. */
  final case class Range(chainId: Long, lo: Long, hi: Long) {
    require(lo <= hi, s"bad range [$lo,$hi]")
    def size: Long = hi - lo + 1
  }

  /** Default node request size (Types.hs:110-111 `blockRequestSize`; ≤120
    * for orphan/memory safety although the node allows 360). */
  val ChunkSize = 120

  /** Split [lo,hi] into DESCENDING windows of ≤ chunk heights
    * (Types.hs:94-99): newest blocks first, so a live consumer sees recent
    * history repaired before deep history. */
  def descChunks(chainId: Long, lo: Long, hi: Long, chunk: Int = ChunkSize): Seq[Range] = {
    require(chunk > 0)
    if (lo > hi) Seq.empty
    else Iterator.iterate(hi)(_ - chunk).takeWhile(_ >= lo)
      .map(top => Range(chainId, math.max(lo, top - chunk + 1), top))
      .toSeq
  }

  /** Genesis-aware backfill plan (Backfill.hs:19-48 `lookupPlan`): for
    * every chain in the graph, the missing ranges between its genesis
    * height and the current cut, clamped so no range dips below genesis
    * (new chains fork in at a non-zero height — the mainnet01 852_054
    * transition is the reference's test fixture).
    *
    * @param genesis   chain → first height that exists on that chain
    * @param cut       chain → current max height (from `/cut`)
    * @param existing  chain → (min,max) currently ingested, if any
    */
  def lookupPlan(genesis: Map[Long, Long], cut: Map[Long, Long],
                 existing: Map[Long, (Long, Long)],
                 chunk: Int = ChunkSize): Seq[Range] =
    genesis.keys.toSeq.sorted.flatMap { cid =>
      val g = genesis(cid)
      val top = cut.getOrElse(cid, g)
      existing.get(cid) match {
        case None =>
          descChunks(cid, g, top, chunk)
        case Some((lo, hi)) =>
          // above the ingested prefix first (newest-first ordering), then
          // the tail below it, both genesis-clamped
          descChunks(cid, hi + 1, top, chunk) ++
            descChunks(cid, g, lo - 1, chunk)
      }
    }
}
