package graft.streaming

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 — the header SSE feed as a REAL custom streaming source (DataSource
  * V2 `MicroBatchStream`), closing the one component class the drop-zone
  * stood in for. The reference's listener holds an HTTP connection to
  * `/header/updates` and reacts to `event:`/`data:` frames
  * (chainweb-data exec/Chainweb/Listen.hs:52-97); this source speaks the
  * same wire shape over a TCP stream:
  *
  *     event: BlockHeader
  *     data: {json}
  *     <blank line>
  *
  * and emits `(event, value)` rows per dispatched frame (multi-`data:`
  * frames join with '\n', per the SSE spec).
  *
  * Delivery contract — identical to the reference's: the SSE hop itself
  * is AT-MOST-ONCE (a dropped connection loses frames; the reference's
  * `retryingListener` reconnects and misses whatever passed in between).
  * Effectively-once ingest comes from the PK-keyed idempotent merge plus
  * offline gap repair (T2/T4). Unlike Spark's own socket source, though,
  * offsets here ARE stable across driver restarts: every dispatched
  * frame is journaled to `<checkpointLocation>/sse-frames.jsonl` BEFORE
  * it becomes visible to `latestOffset`, and a restarted stream reloads
  * the journal — so a batch the checkpoint says was committed can always
  * be replanned (at-least-once from the journal forward; only frames
  * arriving while the listener is DOWN are lost, exactly the reference's
  * reconnect gap). The drop-zone file source remains the fully-replayable
  * alternative when the feed is teed to disk upstream.
  *
  * Scale shape: a chainweb header feed is ~1 row/1.5 s across 20 chains —
  * driver-buffered single-partition batches are the right size by orders
  * of magnitude; the heavy lifting (flatten + merge fan-out) happens in
  * the executors via [[Listen.ingestBatch]].
  */
class SseSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sse"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SseSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SseTable(properties.get("host"),
                 Integer.parseInt(properties.get("port")))
}

object SseSource {
  val Schema: StructType = StructType(Seq(
    StructField("event", StringType), StructField("value", StringType)))
}

class SseTable(host: String, port: Int) extends Table with SupportsRead {
  override def name(): String = s"graft-sse://$host:$port"
  override def schema(): StructType = SseSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SseSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SseMicroBatchStream(host, port, checkpointLocation)
      }
    }
}

/** Offset = number of frames dispatched so far (driver-buffer index). */
case class SseOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class SseMicroBatchStream(host: String, port: Int,
                          checkpointLocation: String = null)
    extends MicroBatchStream {

  private val buffer = new scala.collection.mutable.ArrayBuffer[(String, String)]()
  @volatile private var fatal: Throwable = _
  private var socket: Socket = _

  // Frame journal: offsets must survive a driver restart, because the
  // query checkpoint references them. Base64 keeps frames line-safe.
  private val journal: java.nio.file.Path =
    if (checkpointLocation == null) null
    else {
      val dir = java.nio.file.Paths.get(
        checkpointLocation.stripPrefix("file:"))
      java.nio.file.Files.createDirectories(dir)
      dir.resolve("sse-frames.jsonl")
    }
  private val b64 = java.util.Base64.getEncoder
  private val b64d = java.util.Base64.getDecoder

  if (journal != null && java.nio.file.Files.exists(journal)) {
    java.nio.file.Files.readAllLines(journal, StandardCharsets.UTF_8)
      .forEach { line =>
        if (line.nonEmpty) {
          val Array(e, d) = line.split("\t", 2)
          buffer.append((new String(b64d.decode(e), StandardCharsets.UTF_8),
                         new String(b64d.decode(d), StandardCharsets.UTF_8)))
        }
      }
  }

  private def journalAppend(event: String, data: String): Unit =
    if (journal != null)
      java.nio.file.Files.writeString(journal,
        b64.encodeToString(event.getBytes(StandardCharsets.UTF_8)) + "\t" +
          b64.encodeToString(data.getBytes(StandardCharsets.UTF_8)) + "\n",
        StandardCharsets.UTF_8,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND): Unit

  // SSE frame reader: accumulate field lines until a blank line dispatches
  // the frame (the reference's event loop, Listen.hs:58-66).
  private val reader = new Thread(() => {
    try {
      socket = new Socket(host, port)
      val in = new BufferedReader(new InputStreamReader(
        socket.getInputStream, StandardCharsets.UTF_8))
      var event = ""
      val data = new StringBuilder
      var line = in.readLine()
      while (line != null) {
        if (line.isEmpty) {
          if (data.nonEmpty) buffer.synchronized {
            // journal BEFORE visibility: an offset can only reference a
            // frame that is already durable
            journalAppend(event, data.toString)
            buffer.append((event, data.toString)); ()
          }
          event = ""; data.clear()
        } else if (line.startsWith("event:")) {
          event = line.stripPrefix("event:").trim
        } else if (line.startsWith("data:")) {
          if (data.nonEmpty) { data.append('\n'); () }
          data.append(line.stripPrefix("data:").stripPrefix(" ")); ()
        } // comment/other fields: ignored, per the SSE spec
        line = in.readLine()
      }
    } catch {
      case _: java.net.SocketException => () // closed by stop()
      case t: Throwable                => fatal = t
    }
  }, s"graft-sse-$host:$port")
  reader.setDaemon(true)
  reader.start()

  override def initialOffset(): Offset = SseOffset(0)
  override def latestOffset(): Offset = {
    if (fatal != null) throw fatal
    SseOffset(buffer.synchronized(buffer.size.toLong))
  }
  override def deserializeOffset(json: String): Offset = SseOffset(json.toLong)
  override def commit(end: Offset): Unit = () // buffer kept for the run

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[SseOffset].n.toInt,
                  end.asInstanceOf[SseOffset].n.toInt)
    val slice = buffer.synchronized(buffer.slice(s, e).toArray)
    if (slice.isEmpty) Array.empty else Array(SsePartition(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val rows = partition.asInstanceOf[SsePartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(rows(i)._1),
                    UTF8String.fromString(rows(i)._2))
      override def close(): Unit = ()
    }

  override def stop(): Unit =
    if (socket != null) socket.close()
}

case class SsePartition(rows: Array[(String, String)]) extends InputPartition
