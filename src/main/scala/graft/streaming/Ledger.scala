package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Live account ledger — running balances over the transfer stream via
  * `transformWithState` (Spark 4's arbitrary-state v2 API). This is the
  * streaming face of `Maintenance.balancesFromTransfers`: instead of a
  * daily credits−debits batch, each account's balance is one `ValueState`
  * cell updated per event and emitted per change — the state store scales
  * with active accounts, not history, and supports TTL for dormant keys.
  */
object Ledger {

  final case class Entry(account: String, delta: Double)
  final case class Balance(account: String, balance: Double, n_updates: Long)

  class BalanceProcessor extends StatefulProcessor[String, Entry, Balance] {
    @transient private var state: ValueState[(Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Double, Long)](
        "bal", Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Entry],
                                 timerValues: TimerValues): Iterator[Balance] = {
      var (bal, n) = Option(state.get()).getOrElse((0.0, 0L))
      for (e <- rows) { bal += e.delta; n += 1 }
      state.update((bal, n))
      Iterator.single(Balance(key, bal, n))
    }
  }

  def balances(entries: Dataset[Entry]): Dataset[Balance] = {
    implicit val enc: Encoder[Balance] = Encoders.product[Balance]
    entries
      .groupByKey(_.account)(Encoders.STRING)
      .transformWithState(new BalanceProcessor, TimeMode.None(),
                          OutputMode.Update(), enc)
  }
}
