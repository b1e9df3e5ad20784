package graft

import org.apache.spark.sql.functions._

import graft.warehouse.Compaction

/** Small-file compaction: rows survive exactly, file count hits the
  * target, and a subsequent scan still reads the same content.
  */
class CompactionSpec extends SparkSpecBase {

  test("compact shrinks a many-file table to the target without changing a row") {
    val dir = tmpDir("compaction") + "/t"
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    // simulate the streaming-sink pathology: one file per tiny partition
    docs.repartition(40).write.parquet(dir)
    val filesBefore = Compaction.plan(spark, dir).count()
    assert(filesBefore >= 40, s"setup should fragment the table, got $filesBefore")
    val totalBytes = Compaction.plan(spark, dir)
      .agg(sum("bytes")).head().getLong(0)

    val (nBefore, nAfter, rows) =
      Compaction.compact(spark, dir, targetBytes = totalBytes / 4 + 1)
    assert(nBefore === filesBefore.toInt)
    assert(nAfter <= 4, s"expected <= 4 compacted files, got $nAfter")
    assert(rows === docs.count())

    val after = spark.read.parquet(dir)
    assert(after.count() === docs.count())
    assert(after.exceptAll(docs).isEmpty && docs.exceptAll(after).isEmpty,
      "compaction must preserve content exactly")
  }

  test("plan lists sizes without touching data files' content") {
    val dir = tmpDir("compaction_plan") + "/t"
    Tables.documents(spark, sfDir).limit(10).write.parquet(dir)
    val plan = Compaction.plan(spark, dir).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      assert(r.getAs[String]("file").endsWith(".parquet"))
      assert(r.getAs[Long]("bytes") > 0)
    }
  }
}
