package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.CrossBatchLww
import graft.streaming.CrossBatchLww.{KeyedEvent, Winner}

/** Cross-batch LWW over a MemoryStream: late events rejected against state
  * from earlier micro-batches; winner changes emitted exactly once.
  */
class CrossBatchLwwSpec extends SparkSpecBase {
  import spark.implicits._

  test("late events rejected across micro-batches; winner change emitted once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val out = CrossBatchLww(input.toDS())
    val q = out.writeStream.format("memory").queryName("lww_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("xlww"))
      .start()
    try {
      // batch 1: two events for key 1 — winner is ts 200
      input.addData(KeyedEvent(1, 100, 1, "a"), KeyedEvent(1, 200, 2, "b"))
      q.processAllAvailable()
      // batch 2: LATE event (ts 150) — must be rejected, no emission;
      // plus a genuine newer event for key 2
      input.addData(KeyedEvent(1, 150, 3, "late"), KeyedEvent(2, 50, 4, "c"))
      q.processAllAvailable()
      // batch 3: newer event for key 1 — emitted; equal-ts lower id for key 2 — rejected
      input.addData(KeyedEvent(1, 300, 5, "d"), KeyedEvent(2, 50, 3, "tie-lo"))
      q.processAllAvailable()

      val rows = spark.table("lww_out").as[Winner].collect().toSeq
      val byKey = rows.groupBy(_.key)
      assert(byKey(1L).map(_.event_id).sorted == Seq(2L, 5L),
        "key 1: initial winner + one change, late event never emitted")
      assert(byKey(2L).map(_.event_id) == Seq(4L), "key 2: tie-lower-id rejected")
    } finally q.stop()
  }
}
