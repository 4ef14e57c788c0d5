package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Live distinct-count sketching — the streaming face of the batch HLL
  * (`operators.Sketches.q86HllDistinct`): per group, the 64 HLL registers
  * live in ONE `ValueState` cell (an Array[Byte] — register values are
  * ≤ 27) updated by max-merge per event and emitted as a running estimate
  * per micro-batch. Because a register is a MAX, the state is
  * order/replay-insensitive: late or duplicate events cannot move the
  * estimate once absorbed, and the streaming result converges to exactly
  * the batch estimate over the same rows (SessionsSpec pins equality —
  * determinism is the same argument as the batch operator: integer rank
  * ladder, exact binary-fraction harmonic sum, no libm).
  *
  * State size is m bytes per group — independent of stream length — vs
  * the O(distinct keys) set a naive streaming distinct keeps; this is
  * the sketch's whole point at 100 TB/day ingest.
  */
object Cardinality {

  private val B = 6
  private val M = 1 << B
  private val RankBits = 32 - B
  private val Alpha = 0.709

  final case class Obs(group: String, member: String)
  final case class Estimate(group: String, occupied: Long, estimate: Double)

  /** Same hash→(bucket, rank) mapping as the batch operator: top 32 bits
    * of md5(member), 6 bucket bits, integer leading-rank. Thread-local
    * digest (TextHashUtil) — no per-event allocation in the hot path. */
  private[streaming] def bucketRank(member: String): (Int, Int) = {
    val h32 = graft.functions.TextHashUtil.md5Top32(member)
    val bucket = (h32 >>> RankBits).toInt
    val w = h32 & ((1L << RankBits) - 1)
    var len = 0
    var x = w
    while (x > 0) { len += 1; x >>= 1 }
    (bucket, RankBits + 1 - len)
  }

  private[streaming] def estimateOf(regs: Array[Byte]): Estimate = {
    var s = 0.0
    var occ = 0L
    var j = 0
    while (j < M) {
      if (regs(j) > 0) { s += math.pow(0.5, regs(j).toDouble); occ += 1 }
      else s += 1.0
      j += 1
    }
    Estimate("", occ, BigDecimal(Alpha * M * M / s)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  class HllProcessor extends StatefulProcessor[String, Obs, Estimate] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]](
        "regs", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[Estimate] = {
      val regs = Option(state.get()).getOrElse(new Array[Byte](M))
      for (o <- rows) {
        val (b, r) = bucketRank(o.member)
        if (r > regs(b)) regs(b) = r.toByte
      }
      state.update(regs)
      Iterator.single(estimateOf(regs).copy(group = key))
    }
  }

  def estimates(obs: Dataset[Obs]): Dataset[Estimate] = {
    implicit val enc: Encoder[Estimate] = Encoders.product[Estimate]
    obs.groupByKey(_.group)(Encoders.STRING)
      .transformWithState(new HllProcessor, TimeMode.None(),
                          OutputMode.Update(), enc)
  }
}
