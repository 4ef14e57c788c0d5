package graft.streaming

import graft.operators.Sessionize
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[Sessionize]]: one open session per user held in
  * `flatMapGroupsWithState` state; a session row is emitted when a new
  * event arrives more than the gap after the previous one (or on event-time
  * timeout for keys that go silent — driven by the stream's watermark).
  *
  * State size is O(active keys) × 3 longs — the design that survives
  * unbounded streams; nothing about past events is retained.
  */
object Sessions {

  final case class Ev(user_id: Long, ts_us: Long)
  final case class EvW(user_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  final case class Open(start_us: Long, last_us: Long, n: Long)
  final case class SessionRow(user_id: Long, session_start_us: Long,
                              session_end_us: Long, n_events: Long)

  private val gapUs = Sessionize.GapSeconds * 1000000L

  def update(userId: Long, events: Iterator[EvW],
                     state: GroupState[Open]): Iterator[SessionRow] = {
    var open = state.getOption
    val closed = Vector.newBuilder[SessionRow]
    for (e <- events.toSeq.sortBy(_.ts_us)) {
      open match {
        case Some(o) if e.ts_us - o.last_us > gapUs =>
          closed += SessionRow(userId, o.start_us, o.last_us, o.n)
          open = Some(Open(e.ts_us, e.ts_us, 1))
        case Some(o) =>
          open = Some(o.copy(last_us = math.max(o.last_us, e.ts_us), n = o.n + 1))
        case None =>
          open = Some(Open(e.ts_us, e.ts_us, 1))
      }
    }
    if (state.hasTimedOut) {
      // silent key: the watermark passed last+gap — close what's open
      open.foreach(o => closed += SessionRow(userId, o.start_us, o.last_us, o.n))
      state.remove()
    } else {
      open.foreach { o =>
        state.update(o)
        state.setTimeoutTimestamp(
          math.max(o.last_us / 1000 + gapUs / 1000, state.getCurrentWatermarkMs() + 1))
      }
    }
    closed.result().iterator
  }

  /** Wire the stateful op over a stream of (user_id, ts_us) events; the
    * watermark both bounds state (timeout closes silent keys) and defines
    * lateness tolerance. */
  def sessionStream(events: Dataset[Ev]): Dataset[SessionRow] = {
    implicit val evwEnc = Encoders.product[EvW]
    implicit val openEnc = Encoders.product[Open]
    implicit val rowEnc = Encoders.product[SessionRow]
    implicit val longEnc = Encoders.scalaLong
    events
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("ts_us")))
      .withWatermark("ts", "1 hour")
      .as[EvW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
