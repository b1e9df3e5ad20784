package graft.streaming

import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource-v2 streaming source replaying a commit log — the
  * S1 capture boundary as a first-class Spark source rather than a
  * pre-parsed file stream (reference: the Cassandra CDC agent tails
  * commit-log segments and emits change envelopes to the event bus;
  * `specs/001-cass-cdc-pg/contracts/kafka-topics.md:49-66`).
  *
  * Log layout: a directory of append-only segment files, `*.log`,
  * lexicographic name order = commit order (the commit-log segment
  * contract), one serialized envelope per line. A segment is the
  * ordering unit — like a Kafka partition, lines within a segment are
  * delivered in order; offsets are `(segment index, row in segment)`.
  *
  * Scale/recovery shape:
  *  - one InputPartition per segment slice in a batch → per-segment
  *    parallelism, no shuffle;
  *  - offsets are exactly-once replayable (checkpoint stores the JSON
  *    offset; planInputPartitions re-reads the same slice);
  *  - ST6 backpressure via SupportsAdmissionControl: `maxRowsPerTrigger`
  *    (default 2048, the reference source's `max.batch.size`,
  *    `docker/connectors/cassandra-source.json:26`) bounds each
  *    micro-batch across segments.
  *
  * Output schema mirrors a wire frame (like Kafka's): `value` = the raw
  * envelope line, `segment`/`offset` = provenance. Envelope decoding
  * stays downstream (`CdcSchemas.parse` / `KafkaCdc.decode`-shape), as
  * with any transport.
  *
  * Usage: `spark.readStream.format("graft.streaming.EventLogSource")
  * .option("path", dir).option("maxRowsPerTrigger", n).load()`.
  */
class EventLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventLogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventLogTable(properties.get("path"))
}

object EventLogSource {
  val Schema: StructType = new StructType()
    .add("value", StringType, nullable = false)
    .add("segment", StringType, nullable = false)
    .add("offset", LongType, nullable = false)

  /** Sorted segment files under `dir` (lexicographic = commit order). */
  def segments(dir: String): IndexedSeq[String] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) IndexedSeq.empty
    else {
      val s = Files.list(p) // must close: each stream holds a directory fd
      try s.iterator().asScala
        .filter(f => f.getFileName.toString.endsWith(".log"))
        .map(_.getFileName.toString).toIndexedSeq.sorted
      finally s.close()
    }
  }

  def countRows(dir: String, seg: String): Long = {
    val p = Paths.get(dir, seg)
    var n = 0L
    val it = Files.lines(p)
    try { val i = it.iterator(); while (i.hasNext) { i.next(); n += 1 } }
    finally it.close()
    n
  }
}

/** Stream position: rows [0, `row`) of segment `seg` (by index into the
  * sorted segment list) are consumed, as are all earlier segments.
  * Segments are append-only and new segments sort after old ones
  * (commit-log contract), so the position is stable across restarts.
  */
case class EventLogOffset(seg: Int, row: Long) extends Offset {
  override def json(): String = s"""{"seg":$seg,"row":$row}"""
}

object EventLogOffset {
  private val Re = """\{"seg":(\d+),"row":(\d+)\}""".r
  def parse(json: String): EventLogOffset = json match {
    case Re(s, r) => EventLogOffset(s.toInt, r.toLong)
    case other    => throw new IllegalArgumentException(s"bad offset: $other")
  }
}

final class EventLogTable(path: String) extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  override def name(): String = s"eventlog:$path"
  override def schema(): StructType = EventLogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new EventLogScan(path,
        Option(options.get("maxRowsPerTrigger")).map(_.toLong).getOrElse(2048L))
    }
}

final class EventLogScan(path: String, maxRowsPerTrigger: Long) extends Scan {
  override def readSchema(): StructType = EventLogSource.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EventLogMicroBatchStream(path, maxRowsPerTrigger)
  /** One-shot batch read of the whole log (testing / bootstrap). */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val segs = EventLogSource.segments(path)
      segs.indices.map { i =>
        EventLogSlice(path, segs(i), 0L, EventLogSource.countRows(path, segs(i)))
          : InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = EventLogReaderFactory
  }
}

/** Micro-batch planning: `latestOffset(start, limit)` walks forward from
  * `start` by at most the admitted row count — rate control happens here,
  * in the source, not by post-hoc filtering (Spark then checkpoints
  * exactly what was admitted).
  */
final class EventLogMicroBatchStream(path: String, maxRows: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def segs = EventLogSource.segments(path)

  /** Row counts of CLOSED segments, cached by name: segments are
    * append-only and only the tail segment may still grow, so without
    * this every trigger's offset walk re-reads the whole log history on
    * the driver — O(log size) per trigger, unbounded as segments
    * accumulate. The tail is always recounted.
    */
  private val closedCounts = scala.collection.concurrent.TrieMap.empty[String, Long]

  private def countRows(ss: IndexedSeq[String], i: Int): Long =
    if (i < ss.length - 1)
      closedCounts.getOrElseUpdate(ss(i), EventLogSource.countRows(path, ss(i)))
    else EventLogSource.countRows(path, ss(i)) // growing tail: never cache

  /** Trigger.AvailableNow: snapshot the end of log at start; batches then
    * drain rate-limited up to this cap and the query stops (S2's
    * drain-then-stop semantics on this source).
    */
  @volatile private var availableNowCap: Option[EventLogOffset] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val ss = segs
    availableNowCap = Some(
      if (ss.isEmpty) EventLogOffset(0, 0L)
      else EventLogOffset(ss.length - 1, EventLogSource.countRows(path, ss.last)))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxRows)

  override def initialOffset(): Offset = EventLogOffset(0, 0L)

  override def deserializeOffset(json: String): Offset = EventLogOffset.parse(json)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EventLogOffset]
    var budget = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => r.maxRows()
      case _ => Long.MaxValue
    }
    val ss = segs
    if (ss.isEmpty) return s
    var seg = math.min(s.seg, ss.length - 1)
    var row = if (seg == s.seg) s.row else 0L
    var walking = true
    while (walking) {
      val total = countRows(ss, seg)
      val take = math.max(0L, math.min(budget, total - row))
      row += take
      budget -= take
      if (budget > 0 && row >= total && seg < ss.length - 1) { seg += 1; row = 0L }
      else walking = false // budget spent, or at the (possibly growing) tail segment
    }
    // under Trigger.AvailableNow never admit past the start-time snapshot
    availableNowCap match {
      case Some(cap) if seg > cap.seg || (seg == cap.seg && row > cap.row) => cap
      case _ => EventLogOffset(seg, row)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventLogOffset]
    val e = end.asInstanceOf[EventLogOffset]
    val ss = segs
    (s.seg to math.min(e.seg, ss.length - 1)).flatMap { i =>
      val from = if (i == s.seg) s.row else 0L
      val until = if (i == e.seg) e.row else countRows(ss, i)
      if (until > from) Some(EventLogSlice(path, ss(i), from, until): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = EventLogReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class EventLogSlice(dir: String, seg: String, from: Long, until: Long)
    extends InputPartition

object EventLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[EventLogSlice]
    new PartitionReader[InternalRow] {
      private val stream = Files.lines(Paths.get(slice.dir, slice.seg))
      private val it = stream.iterator()
      private var pos = 0L
      private var current: String = _
      // skip to `from`
      while (pos < slice.from && it.hasNext) { it.next(); pos += 1 }
      override def next(): Boolean =
        if (pos < slice.until && it.hasNext) { current = it.next(); pos += 1; true }
        else false
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current),
          UTF8String.fromString(slice.seg), pos - 1)
      override def close(): Unit = stream.close()
    }
  }
}
