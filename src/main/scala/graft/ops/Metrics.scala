package graft.ops

import scala.collection.concurrent.TrieMap

/** RED-metrics registry + Prometheus text exposition — the reference's
  * `/metrics` contract (`tests/contract/test_metrics_api.py:45-51`
  * required names: `cdc_events_processed_total{table,operation}` counter,
  * `cdc_processing_latency_seconds` histogram, `cdc_backlog_depth` gauge,
  * `cdc_errors_total{error_type}` counter) and the Pushgateway-style
  * alert push of ST13 (`alert_service.py:41-94`).
  *
  * Driver-side, lock-free (TrieMap); fed by the replication job's batch
  * summaries, never by per-row callbacks — the hot path stays inside
  * Spark.
  */
object Metrics {

  /** Reference latency buckets: 0.1..10 s (`scripts/benchmark.py:73`). */
  val LatencyBuckets: Array[Double] = Array(0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)

  type Labels = Seq[(String, String)]

  final class Registry {
    private val counters = TrieMap[(String, Labels), Double]()
    private val gauges = TrieMap[(String, Labels), Double]()
    // name -> (bucket counts incl. +Inf at the end, sum, count)
    private val histos = TrieMap[String, (Array[Long], Double, Long)]()

    def inc(name: String, labels: Labels = Seq.empty, n: Double = 1.0): Unit =
      counters.updateWith((name, labels))(v => Some(v.getOrElse(0.0) + n))

    def setGauge(name: String, value: Double, labels: Labels = Seq.empty): Unit =
      gauges.update((name, labels), value)

    def observe(name: String, seconds: Double): Unit =
      histos.updateWith(name) { cur =>
        val (b, s, c) = cur.getOrElse((Array.fill(LatencyBuckets.length + 1)(0L), 0.0, 0L))
        val nb = b.clone()
        val idx = LatencyBuckets.indexWhere(seconds <= _) match {
          case -1 => LatencyBuckets.length
          case i  => i
        }
        (idx to LatencyBuckets.length).foreach(i => nb(i) += 1) // cumulative buckets
        Some((nb, s + seconds, c + 1))
      }

    private def fmtLabels(labels: Labels): String =
      if (labels.isEmpty) ""
      else labels.map { case (k, v) => s"""$k="$v"""" }.mkString("{", ",", "}")

    private def fmtNum(d: Double): String =
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString

    /** Prometheus exposition format (text/plain version 0.0.4). */
    def render(): String = {
      val sb = new StringBuilder
      val counterNames = counters.keys.map(_._1).toSeq.distinct.sorted
      counterNames.foreach { n =>
        sb.append(s"# TYPE $n counter\n")
        counters.toSeq.filter(_._1._1 == n).sortBy(_._1._2.toString).foreach {
          case ((_, ls), v) => sb.append(s"$n${fmtLabels(ls)} ${fmtNum(v)}\n")
        }
      }
      val gaugeNames = gauges.keys.map(_._1).toSeq.distinct.sorted
      gaugeNames.foreach { n =>
        sb.append(s"# TYPE $n gauge\n")
        gauges.toSeq.filter(_._1._1 == n).sortBy(_._1._2.toString).foreach {
          case ((_, ls), v) => sb.append(s"$n${fmtLabels(ls)} ${fmtNum(v)}\n")
        }
      }
      histos.toSeq.sortBy(_._1).foreach { case (n, (b, s, c)) =>
        sb.append(s"# TYPE $n histogram\n")
        LatencyBuckets.zipWithIndex.foreach { case (le, i) =>
          sb.append(s"""${n}_bucket{le="$le"} ${b(i)}""").append('\n')
        }
        sb.append(s"""${n}_bucket{le="+Inf"} ${b(LatencyBuckets.length)}""").append('\n')
        sb.append(s"${n}_sum ${s}\n")
        sb.append(s"${n}_count $c\n")
      }
      sb.result()
    }
  }

  /** The pipeline's standard instrument names. */
  val EventsProcessed = "cdc_events_processed_total"
  val ProcessingLatency = "cdc_processing_latency_seconds"
  val BacklogDepth = "cdc_backlog_depth"
  val ErrorsTotal = "cdc_errors_total"

  /** Record one replication micro-batch (called from the sink side with
    * already-computed summary numbers — no extra Spark actions).
    */
  def recordBatch(r: Registry, table: String, validByType: Seq[(String, Long)],
      errorsByType: Seq[(String, Long)], batchSeconds: Double, backlog: Long): Unit = {
    validByType.foreach { case (op, n) =>
      r.inc(EventsProcessed, Seq("table" -> table, "operation" -> op), n.toDouble)
    }
    errorsByType.foreach { case (et, n) =>
      r.inc(ErrorsTotal, Seq("error_type" -> et), n.toDouble)
    }
    r.observe(ProcessingLatency, batchSeconds)
    r.setGauge(BacklogDepth, backlog.toDouble, Seq("table" -> table))
  }
}
