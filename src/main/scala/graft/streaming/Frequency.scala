package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Live frequency sketching — the streaming face of the batch Count-Min
  * cells (`operators.Sketches.cmsCells`): per group, the d×w count cells
  * live in ONE `ValueState` cell (a little-endian long array packed as
  * bytes) incremented per event, and each micro-batch emits the running
  * estimates for a fixed probe-key set (e.g. the stop-shingle watchlist
  * feeding the q92 max-df cut on a live ingest).
  *
  * The instructive CONTRAST with [[Cardinality]]: an HLL register is a
  * MAX — idempotent, so replayed/duplicate events cannot move the
  * estimate once absorbed — while a CMS cell is a SUM, which counts a
  * replay twice by design. This processor therefore leans on
  * `transformWithState`'s checkpointed exactly-once contract within the
  * query (the same contract every counting aggregation needs); it does
  * NOT claim the at-least-once tolerance the HLL sketch gets for free.
  *
  * State size is d·w·8 bytes per group — independent of stream length
  * and of the key cardinality it is counting; hash/bucket mapping is
  * bit-identical to the batch operator (same "i:key" md5 strings), so
  * the converged cells — and the probe estimates — EQUAL the batch
  * sketch over the same rows (SessionsSpec pins equality).
  */
object Frequency {

  private val D = graft.operators.Sketches.CmsDepth
  private val W = graft.operators.Sketches.CmsWidth

  final case class Obs(group: String, key: String)
  final case class Freq(group: String, key: String, estimate: Long)

  /** Same mapping as the batch `cmsBucket`: md5("i:key") top-32 mod w. */
  private[streaming] def bucket(i: Int, key: String): Int =
    (graft.functions.TextHashUtil.md5Top32(s"$i:$key") % W).toInt

  private def cellGet(cells: Array[Byte], idx: Int): Long = {
    var v = 0L
    var b = 0
    while (b < 8) { v |= (cells(idx * 8 + b) & 0xffL) << (8 * b); b += 1 }
    v
  }

  private def cellAdd(cells: Array[Byte], idx: Int, delta: Long): Unit = {
    var v = cellGet(cells, idx) + delta
    var b = 0
    while (b < 8) { cells(idx * 8 + b) = (v & 0xff).toByte; v >>= 8; b += 1 }
  }

  private[streaming] def estimateOf(cells: Array[Byte], key: String): Long = {
    var est = Long.MaxValue
    var i = 0
    while (i < D) {
      val c = cellGet(cells, i * W + bucket(i, key))
      if (c < est) est = c
      i += 1
    }
    est
  }

  class CmsProcessor(probes: Seq[String])
      extends StatefulProcessor[String, Obs, Freq] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]](
        "cells", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[Freq] = {
      val cells = Option(state.get()).getOrElse(new Array[Byte](D * W * 8))
      for (o <- rows) {
        var i = 0
        while (i < D) { cellAdd(cells, i * W + bucket(i, o.key), 1L); i += 1 }
      }
      state.update(cells)
      probes.iterator.map(p => Freq(key, p, estimateOf(cells, p)))
    }
  }

  /** Running CMS estimates of `probes` per group over the event stream. */
  def estimates(obs: Dataset[Obs], probes: Seq[String]): Dataset[Freq] = {
    implicit val enc: Encoder[Freq] = Encoders.product[Freq]
    obs.groupByKey(_.group)(Encoders.STRING)
      .transformWithState(new CmsProcessor(probes), TimeMode.None(),
                          OutputMode.Update(), enc)
  }
}
