package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Cluster-shape audit: run the heaviest gate queries with shuffle
  * parallelism forced to a cluster-like width (default 256 — what a
  * ~1000-core cluster's AQE would coalesce toward at this data size) and
  * record, per query, how wide each stage actually ran. The claim under
  * test: no operator collapses to a 1–2-task bottleneck when width is
  * available — i.e. the plans SCALE OUT, and local[32] numbers are a
  * parallelism-bound preview, not a single-task fluke that would wall at
  * 100 TB.
  *
  * Small final stages are expected (top-k outputs, broadcast builds,
  * AQE-coalesced tiny exchanges); the audited signal is `max_tasks` —
  * the widest stage of the query, which must track the forced width for
  * scan/shuffle-heavy plans. One JSON line on stdout:
  * `{"shuffle":N,"queries":{name:{"stages":n,"max_tasks":m,"wall_s":t}}}`.
  */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // cluster-shaped floor: AQE may coalesce below the forced width on
      // local[32] volumes; keep the audit honest by letting it (the
      // max_tasks signal reports what survived)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var stages = List.empty[Int]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages ::= sc.stageInfo.numTasks
    }
    spark.sparkContext.addSparkListener(listener)

    val heavy = Seq(
      "semantic_dedup", "dedup_ngram_jaccard", "decontam_clean",
      "ann_ivfpq_topk", "corpus_curated", "dedup_clusters_chain",
      "dedup_paragraph", "ann_hamming_topk")
    val out = heavy.map { name =>
      stages = Nil
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune every
      // unreferenced projection (e.g. a reassembly collect_list under a
      // final groupBy), so the audit would measure a cheaper plan than
      // the gate query actually runs
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // listener events are async; settle before snapshotting the counts
      Thread.sleep(2000)
      val dt = (System.nanoTime() - t0) / 1e9
      graft.util.Materialize.releaseTracked(spark)
      val st = stages
      f""""$name":{"stages":${st.size},"max_tasks":${if (st.isEmpty) 0 else st.max},"wall_s":$dt%.2f}"""
    }
    println(s"""{"shuffle":$width,"queries":{${out.mkString(",")}}}""")
    spark.stop()
  }
}
