package graft.streaming

import java.io.BufferedInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
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
  * delivered in order.
  *
  * Offsets carry the segment NAME and BYTE position alongside (segment
  * index, row):
  *  - the name makes positions survive retention — the reference's CDC
  *    agent DELETES fully-processed segments, which shifts list indices;
  *    a name-resolved offset still lands on the right segment, and a
  *    deleted *current* segment fails loudly instead of silently
  *    replaying or dropping data;
  *  - the byte position lets every trigger and every reader SEEK to its
  *    slice. Without it, draining one large segment rate-limited is
  *    O(segment) per trigger on both driver (re-counting) and executor
  *    (line-skipping) — O(n²) total; with it each trigger does O(admitted
  *    rows) work.
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

  /** Scan forward from `fromByte`, consuming at most `maxLines` lines.
    * Returns (linesRead, byteAfterLastLine, reachedEof). This is the
    * single byte/row accounting primitive — offsets and readers must
    * agree on it.
    *
    * `countUnterminated`: whether a final line with no trailing newline
    * counts. TRUE for closed segments and batch reads (the writer moved
    * on — that tail line is final). FALSE when the stream scans the
    * GROWING tail segment: a partially-flushed line must not be counted,
    * because the byte anchor would land mid-line in the checkpoint and
    * the next trigger would emit the line's remainder as a garbage row
    * (one event lost + two DLQ phantoms). The uncounted line is consumed
    * on a later trigger, once its newline arrives or the segment closes.
    */
  def scanLines(file: Path, fromByte: Long, maxLines: Long,
      countUnterminated: Boolean = true): (Long, Long, Boolean) = {
    val in = new BufferedInputStream(Files.newInputStream(file))
    try {
      var toSkip = fromByte
      while (toSkip > 0) {
        val skipped = in.skip(toSkip)
        if (skipped <= 0) return (0L, fromByte, true) // past EOF: nothing here
        toSkip -= skipped
      }
      var lines = 0L
      var byte = fromByte
      var sinceNewline = 0L
      var eof = false
      while (lines < maxLines && !eof) {
        val b = in.read()
        if (b < 0) {
          eof = true
          if (sinceNewline > 0 && countUnterminated) {
            lines += 1; byte += sinceNewline; sinceNewline = 0
          }
        } else if (b == '\n') {
          lines += 1; byte += sinceNewline + 1; sinceNewline = 0
        } else sinceNewline += 1
      }
      if (!eof && lines == maxLines && in.read() < 0) eof = true
      (lines, byte, eof)
    } finally in.close()
  }

  def countRows(dir: String, seg: String): Long =
    scanLines(Paths.get(dir, seg), 0L, Long.MaxValue)._1
}

/** Stream position: rows [0, `row`) of segment `seg` are consumed, as are
  * all earlier segments. `name` pins the segment identity across
  * retention (index shifts); `byte` is the file position of row `row`
  * (−1 = unknown, resolved by a one-time scan — legacy checkpoints).
  */
case class EventLogOffset(seg: Int, row: Long, name: String = "", byte: Long = -1L)
    extends Offset {
  override def json(): String =
    s"""{"seg":$seg,"row":$row,"name":"$name","byte":$byte}"""
}

object EventLogOffset {
  private val Re = """\{"seg":(\d+),"row":(\d+),"name":"([^"]*)","byte":(-?\d+)\}""".r
  private val LegacyRe = """\{"seg":(\d+),"row":(\d+)\}""".r
  def parse(json: String): EventLogOffset = json match {
    case Re(s, r, n, b)  => EventLogOffset(s.toInt, r.toLong, n, b.toLong)
    case LegacyRe(s, r)  => EventLogOffset(s.toInt, r.toLong) // pre-name checkpoint
    case other           => throw new IllegalArgumentException(s"bad offset: $other")
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
        Option(options.get("maxRowsPerTrigger")).map(_.toLong).getOrElse(2048L),
        Option(options.get("admissionChannel")),
        Option(options.get("tailQuiesceMs")).map(_.toLong).getOrElse(-1L))
    }
}

final class EventLogScan(path: String, maxRowsPerTrigger: Long,
    admissionChannel: Option[String] = None,
    tailQuiesceMs: Long = -1L) extends Scan {
  override def readSchema(): StructType = EventLogSource.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EventLogMicroBatchStream(path, maxRowsPerTrigger, admissionChannel, tailQuiesceMs)
  /** One-shot batch read of the whole log (testing / bootstrap). */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val segs = EventLogSource.segments(path)
      segs.indices.map { i =>
        EventLogSlice(path, segs(i), 0L, EventLogSource.countRows(path, segs(i)), 0L)
          : InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = EventLogReaderFactory
  }
}

/** Micro-batch planning: `latestOffset(start, limit)` walks forward from
  * `start` by at most the admitted row count — rate control happens here,
  * in the source, not by post-hoc filtering (Spark then checkpoints
  * exactly what was admitted). The walk scans only the bytes it admits
  * (the offset carries the byte anchor), so a trigger is O(admitted),
  * not O(log).
  */
final class EventLogMicroBatchStream(path: String, maxRows: Long,
    admissionChannel: Option[String] = None,
    tailQuiesceMs: Long = -1L)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def segs = EventLogSource.segments(path)

  /** Row counts of CLOSED segments, cached by name (append-only: only the
    * tail may grow, and the walk never re-scans consumed bytes anyway).
    */
  private val closedCounts = scala.collection.concurrent.TrieMap.empty[String, Long]

  private def countClosed(ss: IndexedSeq[String], i: Int): Long =
    if (i < ss.length - 1)
      closedCounts.getOrElseUpdate(ss(i), EventLogSource.countRows(path, ss(i)))
    else EventLogSource.countRows(path, ss(i))

  /** Resolve an offset's segment against the CURRENT listing. Name wins
    * over index: retention deleting fully-consumed earlier segments
    * shifts indices but not names. A missing CURRENT segment is
    * unrecoverable — fail loudly, never clamp onto the wrong file.
    */
  private def resolveSeg(o: EventLogOffset, ss: IndexedSeq[String]): Int =
    if (o.name.isEmpty) math.min(o.seg, ss.length - 1) // initial/legacy offset
    else {
      val i = ss.indexOf(o.name)
      if (i < 0) throw new IllegalStateException(
        s"checkpointed segment '${o.name}' no longer exists under $path — " +
          "segment retention deleted an unconsumed segment; restore it or reset " +
          "the checkpoint (consumed earlier segments may be deleted freely)")
      i
    }

  /** Byte anchor for an offset within its (resolved) segment; legacy
    * offsets without one pay a one-time scan of `row` lines.
    */
  private def resolveByte(o: EventLogOffset, seg: String): Long =
    if (o.byte >= 0) o.byte
    else EventLogSource.scanLines(Paths.get(path, seg), 0L, o.row)._2

  /** Trigger.AvailableNow: snapshot the end of log at start; batches then
    * drain rate-limited up to this cap and the query stops (S2's
    * drain-then-stop semantics on this source).
    */
  @volatile private var availableNowCap: Option[EventLogOffset] = None
  @volatile private var capCountsTail: Boolean = false

  /** Bytes of unterminated tail line the AvailableNow snapshot EXCLUDED
    * from its drain cap (0 = none). The exclusion is correct-by-default
    * (a partial flush must not be committed as an event) but must never
    * be silent: a drain that "completed" while this is non-zero left the
    * final event behind, and the operator deciding whether the writer is
    * really done — and whether `tailQuiesceMs` applies — needs to know.
    */
  @volatile var excludedTailBytes: Long = 0L

  override def prepareForTriggerAvailableNow(): Unit = {
    val ss = segs
    excludedTailBytes = 0L
    availableNowCap = Some(
      if (ss.isEmpty) EventLogOffset(0, 0L)
      else {
        // tail rule: a partially-flushed final line is not available — a
        // cap counting it could never be reached. EXCEPT, OPT-IN
        // (`tailQuiesceMs` > 0), on a QUIESCENT tail (no write for that
        // long): an S2 snapshot drain over a FINISHED log whose writer
        // ended without a trailing newline would otherwise silently drop
        // the last event. Opt-in because mtime quiescence cannot prove
        // the writer is DONE — a writer stalled mid-line past the window
        // (GC pause, fsync backlog) would get its half-flushed fragment
        // committed as an event and the resumed remainder as a second
        // garbage row. Enable only where writers are known dead or are
        // contractually line-terminated before handoff.
        val tail = Paths.get(path, ss.last)
        val quiescent = tailQuiesceMs > 0 &&
          (try System.currentTimeMillis() -
            Files.getLastModifiedTime(tail).toMillis >= tailQuiesceMs
          catch { case _: Exception => false })
        capCountsTail = quiescent
        val (rows, bytes, _) = EventLogSource.scanLines(
          tail, 0L, Long.MaxValue, countUnterminated = quiescent)
        // the conservative default silently capping PAST an unterminated
        // final line is a data-honesty hole on a finished log: surface
        // exactly what was left behind and the knob that admits it
        val left = (try Files.size(tail) catch { case _: Exception => bytes }) - bytes
        if (!quiescent && left > 0) {
          excludedTailBytes = left
          System.err.println(s"[graft] AvailableNow drain cap for $path " +
            s"excludes $left byte(s) of unterminated final line in " +
            s"${ss.last}: the writer has not terminated its last event. " +
            "If the log is finished, terminate the line or set " +
            "tailQuiesceMs to admit a quiescent tail.")
        }
        EventLogOffset(ss.length - 1, rows, ss.last, bytes)
      })
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
    // FR-024 dynamic backpressure: the sink's health channel shrinks (or
    // zeroes — pause) this trigger's admission BEFORE the walk, so rate
    // control stays in the source and the checkpoint records exactly what
    // was admitted. Zero admission returns `start` unchanged: no batch.
    admissionChannel.foreach { ch => budget = AdmissionControl.admit(ch, budget) }
    if (budget <= 0) return s
    val ss = segs
    if (ss.isEmpty) return s
    var seg = resolveSeg(s, ss)
    // `row`/`byte` carry over ONLY when the resolved segment is the one
    // the offset was taken on. A name-less (legacy/initial) offset whose
    // index was clamped onto a DIFFERENT segment must restart at 0 — the
    // clamped segment was never consumed, and keeping s.row would
    // silently skip its first s.row rows. (Named offsets either resolve
    // to their own segment or resolveSeg has already thrown.)
    val sameSeg = if (s.name.isEmpty) seg == s.seg else true
    var row = if (sameSeg) s.row else 0L
    var byte = if (sameSeg) resolveByte(s, ss(seg)) else 0L
    var walking = true
    while (walking && budget > 0) {
      // the LAST segment may still be growing: never count (or anchor
      // past) a partially-flushed unterminated line there — unless the
      // AvailableNow snapshot already judged this tail quiescent and
      // counted its final line (the cap clamp below still bounds
      // admission at the snapshot)
      val countTail = capCountsTail &&
        availableNowCap.exists(_.name == ss(seg))
      val (taken, newByte, eof) = EventLogSource.scanLines(
        Paths.get(path, ss(seg)), byte, budget,
        countUnterminated = seg < ss.length - 1 || countTail)
      row += taken
      byte = newByte
      budget -= taken
      if (budget > 0 && eof && seg < ss.length - 1) { seg += 1; row = 0L; byte = 0L }
      else walking = false // budget spent, or at the (possibly growing) tail
    }
    val next = EventLogOffset(seg, row, ss(seg), byte)
    // under Trigger.AvailableNow never admit past the start-time
    // snapshot. The cap's segment is compared by NAME re-resolved in the
    // CURRENT listing — retention of consumed earlier segments shifts
    // indices mid-drain, and a stale index compare would let rows
    // appended to the cap segment after the snapshot keep the "drain and
    // stop" query running forever.
    availableNowCap match {
      case Some(cap) =>
        val capIdx = if (cap.name.isEmpty) -1 else ss.indexOf(cap.name)
        if (capIdx < 0) s // cap segment gone/empty log: nothing admissible
        else if (seg > capIdx || (seg == capIdx && row > cap.row))
          cap.copy(seg = capIdx)
        else next
      case None => next
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventLogOffset]
    val e = end.asInstanceOf[EventLogOffset]
    val ss = segs
    if (ss.isEmpty) return Array.empty
    val sIdx = resolveSeg(s, ss)
    val eIdx = resolveSeg(e, ss)
    (sIdx to eIdx).flatMap { i =>
      // same rule as latestOffset: a clamped name-less start is NOT the
      // segment the offset was taken on — read it from row 0
      val sameAsStart = i == sIdx &&
        (if (s.name.isEmpty) sIdx == s.seg else ss(i) == s.name)
      val from = if (sameAsStart) s.row else 0L
      val fromByte = if (sameAsStart) resolveByte(s, ss(i)) else 0L
      val until = if (i == eIdx) e.row else countClosed(ss, i)
      if (until > from) Some(EventLogSlice(path, ss(i), from, until, fromByte): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = EventLogReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class EventLogSlice(dir: String, seg: String, from: Long, until: Long,
    fromByte: Long) extends InputPartition

object EventLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[EventLogSlice]
    new PartitionReader[InternalRow] {
      // seek straight to the slice: no O(from) line-skip per batch
      private val in = new BufferedInputStream(
        Files.newInputStream(Paths.get(slice.dir, slice.seg)))
      locally {
        var toSkip = slice.fromByte
        while (toSkip > 0) {
          val skipped = in.skip(toSkip)
          require(skipped > 0, s"byte offset ${slice.fromByte} past EOF of ${slice.seg}")
          toSkip -= skipped
        }
      }
      // '\n'-ONLY line splitting, matching scanLines' byte accounting: a
      // BufferedReader.readLine would also split on lone '\r' INSIDE a
      // payload, desyncing the reader's row numbering from the planner's
      // counts — rows silently dropped from the slice and every later
      // offset shifted
      private def readLineLf(): String = {
        var b = in.read()
        if (b < 0) return null
        val buf = new java.io.ByteArrayOutputStream(128)
        while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
        new String(buf.toByteArray, StandardCharsets.UTF_8)
      }
      private var pos = slice.from
      private var current: String = _
      override def next(): Boolean =
        if (pos < slice.until) {
          current = readLineLf()
          if (current == null) false else { pos += 1; true }
        } else false
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current),
          UTF8String.fromString(slice.seg), pos - 1)
      override def close(): Unit = in.close()
    }
  }
}
