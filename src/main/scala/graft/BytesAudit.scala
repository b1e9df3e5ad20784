package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Cross-SF shuffle-BYTES scaling audit (round-16 verdict #1) — the scale
  * axis the other three audits don't measure: [[ScaleAudit]] proves plans
  * go WIDE, [[SkewAudit]] proves tasks BALANCE, [[PlanLint]] proves
  * SHAPES, but none of them would catch a candidate generator whose
  * shuffle volume grows superlinearly while staying wide and balanced
  * (LSH bucket occupancy on a skewed corpus, n-gram postings under
  * boilerplate, a pair join quietly quadratic in a hot key). This audit
  * makes the "linear at 100 TB" claim EMPIRICAL: run every heavy-list
  * gate query at two fixture scales a known `factor` apart (sf0.01 →
  * sf0.1, factor 10) and gate
  *
  *   `bytes(large) <= c * factor * bytes(small)`   (c = 2 for log factors)
  *
  * on total shuffle volume (read + write), with an absolute floor so
  * constant overheads at tiny scale can't fabricate a ratio: a query
  * whose large-scale shuffle stays under `FloorBytes` is linear by
  * inspection regardless of ratio, and a small-scale measurement is
  * clamped up to `BasisFloorBytes` before dividing (a 3 KiB basis
  * otherwise turns a fixed 100 KiB register exchange into a fake 30x).
  * Spill bytes ride along in the artifact as a memory-pressure
  * breadcrumb but do not gate (local[32] spill is a heap artifact, not
  * a scaling property).
  *
  * One JSON line on stdout:
  * `{"factor":F,"c":C,"superlinear":[...],"queries":{name:{"small_bytes":a,"large_bytes":b,"ratio":r,...}}}`
  * — exit 1 if any query is superlinear.
  */
object BytesAudit {

  /** Shuffle/spill byte totals accumulated across the stages of one
    * measured action.
    */
  final case class Bytes(shuffleRead: Long, shuffleWrite: Long,
      memSpill: Long, diskSpill: Long) {
    def shuffleTotal: Long = shuffleRead + shuffleWrite
    def plus(o: Bytes): Bytes = Bytes(shuffleRead + o.shuffleRead,
      shuffleWrite + o.shuffleWrite, memSpill + o.memSpill,
      diskSpill + o.diskSpill)
  }

  /** Below this large-scale shuffle volume a query cannot be a scaling
    * hazard — 4 MiB at sf0.1 extrapolates to ~4 GiB at 100 TB-equivalent
    * scale, register-sized for a cluster.
    */
  val FloorBytes: Long = 4L << 20
  /** Small-scale basis clamp: ratios are computed against at least this
    * much, so a near-zero basis (everything broadcast at tiny scale)
    * cannot fabricate an unbounded ratio out of fixed overheads.
    */
  val BasisFloorBytes: Long = 256L << 10

  /** The superlinear verdict, factored out for the spec: flagged iff the
    * large-scale shuffle clears the absolute floor AND grew more than
    * `c * factor` over the (floor-clamped) small-scale basis.
    */
  def isSuperlinear(smallBytes: Long, largeBytes: Long, factor: Double,
      c: Double = 2.0): Boolean =
    largeBytes >= FloorBytes &&
      largeBytes.toDouble / math.max(smallBytes, BasisFloorBytes).toDouble >
        c * factor

  /** Run `body` with a stage-metrics listener attached and return the
    * shuffle/spill bytes its stages accumulated. The listener bus is
    * asynchronous, so the snapshot must not race late completion events:
    * rather than a fixed sleep (which silently under-counts on a loaded
    * host — exactly the false PASS this audit exists to prevent), the
    * listener also counts `onStageSubmitted`, and the drain polls until
    * every submitted stage's completion event has arrived (skipped stages
    * never emit a submit, so the counts reconcile exactly). `settleMs`
    * remains only as the hard timeout fallback for a stage whose
    * completion event the bus genuinely dropped.
    */
  def measure(spark: SparkSession, settleMs: Long = 15000)(body: => Unit): Bytes = {
    @volatile var acc = Bytes(0, 0, 0, 0)
    val submitted = new java.util.concurrent.atomic.AtomicLong(0)
    val completed = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onStageSubmitted(ss: SparkListenerStageSubmitted): Unit =
        submitted.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) acc = acc.plus(Bytes(
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled, m.diskBytesSpilled))
        completed.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // Primary drain: LiveListenerBus.waitUntilEmpty — deterministic, blocks
      // until every queued event (submits AND completions) has been delivered.
      // It is `private[spark]` in Scala but public in bytecode, so reflection;
      // if the API ever moves, fall through to the counter reconciliation.
      val busDrained =
        try {
          val bus = spark.sparkContext.getClass.getMethod("listenerBus")
            .invoke(spark.sparkContext)
          bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
            .invoke(bus, java.lang.Long.valueOf(settleMs))
          true
        } catch { case scala.util.control.NonFatal(_) => false }
      // Cross-check (and fallback when reflection is unavailable): body's
      // actions have returned, so all events are already posted in order;
      // poll until every observed submit has its completion.
      val deadline = System.nanoTime() + settleMs * 1000000L
      while (completed.get() < submitted.get() && System.nanoTime() < deadline)
        Thread.sleep(20)
      if (completed.get() < submitted.get())
        System.err.println(s"[bytes] WARN listener drain " +
          s"${if (busDrained) "reconciliation failed after waitUntilEmpty"
              else "timed out (waitUntilEmpty unavailable)"}: " +
          s"${completed.get()}/${submitted.get()} stage completions seen")
    }
    finally spark.sparkContext.removeSparkListener(listener)
    acc
  }

  def main(args: Array[String]): Unit = {
    val sfSmall = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val sfLarge = sys.env.getOrElse("SPARK_GRAFT_SF_LARGE", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SF_FACTOR", "10").toDouble
    val c = sys.env.getOrElse("SPARK_GRAFT_BYTES_C", "2").toDouble
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      // the PRODUCTION shuffle config, not ScaleAudit's forced width:
      // bytes are a volume property; the audit measures what the gate
      // queries actually move, AQE re-planning included
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val targets = if (args.nonEmpty) args.toSeq else ScaleAudit.heavy
    def pass(sfDir: String): Map[String, Bytes] = targets.map { name =>
      val b = measure(spark) {
        // noop sink, not count(): count() lets Catalyst prune columns the
        // gate query actually materializes (the ScaleAudit rationale)
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.util.Materialize.releaseTracked(spark)
      System.err.println(f"[bytes] $sfDir%-28s $name%-34s " +
        f"shuffle=${b.shuffleTotal}%12d spill=${b.memSpill + b.diskSpill}%12d")
      name -> b
    }.toMap

    val small = pass(sfSmall)
    val large = pass(sfLarge)
    var superlinear = List.empty[String]
    val rows = targets.map { name =>
      val (s, l) = (small(name), large(name))
      val ratio = l.shuffleTotal.toDouble /
        math.max(s.shuffleTotal, BasisFloorBytes).toDouble
      if (isSuperlinear(s.shuffleTotal, l.shuffleTotal, factor, c))
        superlinear ::= name
      f""""$name":{"small_bytes":${s.shuffleTotal},"large_bytes":${l.shuffleTotal},""" +
        f""""ratio":$ratio%.2f,"large_spill":${l.memSpill + l.diskSpill}}"""
    }
    val sup = superlinear.reverse.map(n => s""""$n"""").mkString("[", ",", "]")
    println(s"""{"factor":$factor,"c":$c,"floor_bytes":$FloorBytes,""" +
      s""""basis_floor_bytes":$BasisFloorBytes,"n_queries":${targets.size},""" +
      s""""superlinear":$sup,"queries":{${rows.mkString(",")}}}""")
    if (superlinear.nonEmpty) {
      System.err.println(
        s"SUPERLINEAR (> ${c * factor}x shuffle growth at ${factor}x data): " +
          superlinear.reverse.mkString(", "))
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
