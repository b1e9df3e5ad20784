package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf profiler: time selected queries twice (cold/warm) on a
  * given SF dir; optionally dump the formatted plan. Not part of the
  * driver contract — a development tool.
  *
  * Usage: runMain graft.PerfProbe <sfDir> [explain] <query...>
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("explain")
    val names = args.drop(1).filterNot(_ == "explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var stages = List.empty[(Int, String, Long, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val run = si.taskMetrics.executorRunTime
        val gc = si.taskMetrics.jvmGCTime
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages ::= ((si.stageId, si.name.takeWhile(_ != '\n').take(60), wall, run, gc, si.numTasks))
      }
    })
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (explain) fn(spark, sfDir).explain("formatted")
      stages = Nil
      val t0 = System.nanoTime(); val c1 = fn(spark, sfDir).count()
      val t1 = System.nanoTime(); val c2 = fn(spark, sfDir).count()
      val t2 = System.nanoTime()
      println(f"PERF $n%-28s cold=${(t1 - t0) / 1e9}%8.2fs warm=${(t2 - t1) / 1e9}%8.2fs rows=$c1%d")
      Thread.sleep(300) // let listener drain
      stages.sortBy(-_._3).take(8).foreach { case (id, nm, wall, run, gc, nt) =>
        println(f"  STAGE $id%4d wall=${wall / 1e3}%7.1fs run=${run / 1e3}%8.1fs gc=${gc / 1e3}%6.1fs tasks=$nt%4d  $nm")
      }
    }
    spark.stop()
  }
}
