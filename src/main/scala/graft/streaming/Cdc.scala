package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Live snapshot/CDC classification — the streaming face of the batch
  * snapshot diff (`operators.Snapshot.q120SnapshotDiff`): a release
  * arrives as a stream of keyed upserts (and tombstones), and each event
  * is classified against the per-key state exactly the way the batch
  * full-outer join classifies two releases:
  *
  *   no prior fingerprint  → added
  *   fingerprint differs   → changed
  *   fingerprint equal     → unchanged
  *   tombstone             → removed (state cleared)
  *
  * State is ONE fingerprint string per live key — the md5 the batch
  * operator joins on, never the document — so a 100 TB corpus keeps
  * 32 B/doc of state, and the classification stream drives the same
  * consumers as the batch diff (incremental re-dedup, re-embedding of
  * changed docs, release audit trails).
  *
  * Delivery contract (the HLL-vs-CMS distinction documented in
  * streaming/Frequency): the STATE is replay-idempotent — reprocessing
  * an absorbed upsert cannot change the stored fingerprint — but the
  * emitted status of a replay reads `unchanged` rather than re-reading
  * `added`/`changed`, so consumers that act on statuses (not state)
  * want the query's exactly-once, same as any sum-shaped sink.
  */
object Cdc {

  final case class Upsert(doc_id: Long, fp: String, deleted: Boolean)
  final case class Change(doc_id: Long, status: String)

  class CdcProcessor extends StatefulProcessor[Long, Upsert, Change] {
    @transient private var state: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[String](
        "fp", Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Upsert],
                                 timerValues: TimerValues): Iterator[Change] = {
      val out = Seq.newBuilder[Change]
      for (u <- rows) {
        val prev = Option(state.get())
        if (u.deleted) {
          // tombstone for an unknown key is a no-op (idempotent deletes)
          if (prev.isDefined) {
            out += Change(key, "removed")
            state.clear()
          }
        } else {
          val status = prev match {
            case None                  => "added"
            case Some(f) if f != u.fp  => "changed"
            case Some(_)               => "unchanged"
          }
          out += Change(key, status)
          state.update(u.fp)
        }
      }
      out.result().iterator
    }
  }

  def changes(upserts: Dataset[Upsert]): Dataset[Change] = {
    implicit val enc: Encoder[Change] = Encoders.product[Change]
    upserts.groupByKey(_.doc_id)(Encoders.scalaLong)
      .transformWithState(new CdcProcessor, TimeMode.None(),
                          OutputMode.Update(), enc)
  }
}
