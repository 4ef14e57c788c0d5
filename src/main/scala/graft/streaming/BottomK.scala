package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Live distinct-count sketching via bottom-k — the streaming face of the
  * batch KMV (`operators.Sketches.kmvBottom`/`kmvEstimate`), completing
  * the streaming side of all three sketch state shapes:
  *
  *   - HLL (`Cardinality`): MAX state — replay-idempotent;
  *   - CMS (`Frequency`):   SUM state — needs the query's exactly-once;
  *   - KMV (here):          MIN-SET state — replay-idempotent: inserting
  *     a hash already in the set, or one larger than the current k-th,
  *     is a no-op, so duplicates and late replays cannot move the
  *     estimate once absorbed.
  *
  * State is ≤ k longs per group (8·k bytes), independent of stream
  * length; the emitted estimate is monotone nondecreasing (the set only
  * ever gains smaller hashes) and converges to EXACTLY the batch
  * estimate over the same rows — same md5-top-32 hash, same
  * (k−1)·2^32/h_(k) estimator, same decimal routing (SessionsSpec pins
  * equality).
  */
object BottomK {

  private val K = graft.operators.Sketches.KmvK

  final case class Obs(group: String, member: String)
  final case class Estimate(group: String, occupied: Long, estimate: Double)

  private[streaming] def unpack(bytes: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(buf.getLong)
  }

  private[streaming] def pack(set: Array[Long]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(set.length * 8)
    set.foreach(buf.putLong)
    buf.array()
  }

  /** Insert `h` into the sorted distinct bottom-k set; no-op if present
    * or larger than a full set's maximum. */
  private[streaming] def insert(set: Array[Long], h: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(set, h)
    if (idx >= 0) set // already held — replays are free
    else {
      val ins = -idx - 1
      if (set.length < K) {
        val out = new Array[Long](set.length + 1)
        System.arraycopy(set, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(set, ins, out, ins + 1, set.length - ins)
        out
      } else if (ins == set.length) set // larger than the k-th — no-op
      else {
        val out = new Array[Long](K)
        System.arraycopy(set, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(set, ins, out, ins + 1, K - ins - 1)
        out
      }
    }
  }

  /** The batch estimator verbatim: exact below k, else (k−1)·2^32/h_(k)
    * routed double→DECIMAL(28,12)→round 4 exactly as the batch column
    * program spells it. */
  private[streaming] def estimateOf(set: Array[Long]): Double =
    if (set.length < K) set.length.toDouble
    else
      BigDecimal((K - 1).toDouble * 4294967296.0 / set(K - 1))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble

  class KmvProcessor extends StatefulProcessor[String, Obs, Estimate] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]](
        "bottomk", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[Estimate] = {
      var set = Option(state.get()).map(unpack).getOrElse(Array.empty[Long])
      for (o <- rows)
        set = insert(set, graft.functions.TextHashUtil.md5Top32(o.member))
      state.update(pack(set))
      Iterator.single(Estimate(key, set.length.toLong, estimateOf(set)))
    }
  }

  def estimates(obs: Dataset[Obs]): Dataset[Estimate] = {
    implicit val enc: Encoder[Estimate] = Encoders.product[Estimate]
    obs.groupByKey(_.group)(Encoders.STRING)
      .transformWithState(new KmvProcessor, TimeMode.None(),
                          OutputMode.Update(), enc)
  }
}
