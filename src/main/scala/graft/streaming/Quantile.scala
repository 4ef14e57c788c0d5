package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Live quantile sketching — the streaming face of the batch histogram
  * median (`operators.Sketches.q102HistMedian`), completing the
  * batch+streaming pairing for all three sketch families (HLL: distinct,
  * CMS: frequency, histogram: rank/quantile).
  *
  * Per group, the fixed-width bin counters live in a `MapState[bin → n]`
  * — state grows with the VALUE RANGE (|bins|), never with the stream —
  * and each micro-batch emits the running median estimate: the first bin
  * whose cumulative count reaches rank (n+1)/2, exactly the batch rule,
  * so the converged estimate EQUALS the batch sketch over the same rows
  * (SessionsSpec pins equality). Like the CMS cells ([[Frequency]]) and
  * unlike the HLL registers, bin counters are SUMS: replays count twice,
  * so the operator leans on `transformWithState`'s exactly-once within
  * the query.
  */
object Quantile {

  private val W = graft.operators.Sketches.HistBinWidth

  final case class Obs(group: String, value: Long)
  final case class Est(group: String, n: Long, histMedianLow: Long)

  class HistProcessor extends StatefulProcessor[String, Obs, Est] {
    @transient private var bins: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bins = getHandle.getMapState[Long, Long](
        "bins", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[Est] = {
      for (o <- rows) {
        val b = o.value / W
        bins.updateValue(b, Option(bins.getValue(b)).map(_ + 1L).getOrElse(1L))
      }
      val sorted = bins.iterator().map(p => (p._1, p._2)).toArray.sortBy(_._1)
      val n = sorted.map(_._2).sum
      val rank = (n + 1) / 2
      var cum = 0L
      var low = 0L
      var found = false
      for ((b, c) <- sorted if !found) {
        cum += c
        if (cum >= rank) { low = b * W; found = true }
      }
      Iterator.single(Est(key, n, low))
    }
  }

  /** Running histogram-median estimates per group over the value stream. */
  def estimates(obs: Dataset[Obs]): Dataset[Est] = {
    implicit val enc: Encoder[Est] = Encoders.product[Est]
    obs.groupByKey(_.group)(Encoders.STRING)
      .transformWithState(new HistProcessor, TimeMode.None(),
                          OutputMode.Update(), enc)
  }
}
