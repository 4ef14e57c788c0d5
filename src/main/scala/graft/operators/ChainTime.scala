package graft.operators

import java.time.Instant

/** Height ↔ time conversion (SURVEY §2.8 F9 — chainweb-data
  * exec/Chainweb/Coins.hs:162-176 `dateToHeight`/`heightToDate`: the chain
  * produces one block per 30s per chain, so height is an affine clock).
  * Pure driver-side math; used to translate date-range API filters into
  * height ranges that partition-prune (SURVEY §4). */
object ChainTime {

  val BlockIntervalSeconds = 30L
  val Genesis: Instant = Instant.parse("2019-10-30T00:01:00Z")

  def heightToDate(height: Long): Instant =
    Genesis.plusSeconds(height * BlockIntervalSeconds)

  def dateToHeight(t: Instant): Long =
    math.max(0L, (t.getEpochSecond - Genesis.getEpochSecond) / BlockIntervalSeconds)
}
