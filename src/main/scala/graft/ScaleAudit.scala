package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Cluster-shape audit: run the heaviest gate queries with
  * `spark.sql.shuffle.partitions` forced to a cluster-like width and
  * report per-stage task counts. The property under test is that no
  * corpus-processing operator COLLAPSES to a handful of tasks when the
  * configured width grows — i.e. the plans scale out, they don't
  * degenerate to single-task stages that would serialize a 1000-executor
  * cluster.
  *
  * AQE partition coalescing is deliberately OFF here: at sf0.1 the
  * post-shuffle data is small enough that AQE would (correctly) shrink
  * partitions, which is the behavior you want in production but hides
  * the width property this audit exists to demonstrate. Tiny stages are
  * still expected — broadcast builds, one-row stats, bounded codebook
  * samples, k·P window tails — so the report separates the WIDE stages
  * (the corpus path) from the bounded control-data stages instead of
  * asserting a global minimum.
  *
  * Output: one JSON line per query with the stage task-count histogram
  * and the width of the widest stage; a final summary line.
  */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256")
    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq("dedup_ngram_jaccard", "dedup_embedding_cosine",
        "dedup_clusters", "decontam_clean", "ann_ivf_topk")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // widen file scans too: a single 20 MB parquet file must not pin
      // the scan stage to one task when the cluster has 256 slots
      .config("spark.sql.files.maxPartitionBytes", (1 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = ArrayBuffer.empty[Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.synchronized { stages += sc.stageInfo.numTasks }
    })

    def histo(xs: Seq[Int]): String = xs.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (n, g) => s""""$n":${g.size}""" }.mkString("{", ",", "}")

    val rows = names.map { name =>
      stages.synchronized(stages.clear())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite")
        .format("noop").save()
      // listener events are async (the bus is private API); a short
      // settle is enough for an offline audit
      Thread.sleep(2000)
      val snap = stages.synchronized(stages.toSeq)
      val widest = if (snap.isEmpty) 0 else snap.max
      val wide = snap.count(_ >= width.toInt / 2)
      val line = s"""{"query":"$name","widest_stage":$widest,""" +
        s""""stages_at_width":$wide,"n_stages":${snap.size},""" +
        s""""task_histogram":${histo(snap)}}"""
      println(line)
      (name, widest, wide)
    }

    val collapsed = rows.filter(_._2 < width.toInt / 2)
    println(s"""{"metric":"scale_audit","width":$width,"queries":${rows.size},""" +
      s""""collapsed":[${collapsed.map(c => s""""${c._1}"""").mkString(",")}]}""")
    spark.stop()
  }
}
