package graft

import org.apache.spark.sql.functions._

import graft.warehouse.ZoneMap
import graft.warehouse.ZoneMap.RangePred

/** Zone maps: hand-derived audit values on a tiny clustered table, the
  * no-false-pruning invariant (scanned ≥ matched, always), and the
  * all-zones-kept behavior on an uncorrelated column.
  */
class ZoneMapSpec extends SparkSpecBase {
  import spark.implicits._

  // 3 zones of 4 rows; k clustered by zone, u anti-correlated
  private def tiny = Seq(
    (0L, 10L, 3L), (1L, 12L, 2L), (2L, 15L, 1L), (3L, 19L, 0L),
    (4L, 20L, 3L), (5L, 22L, 2L), (6L, 25L, 1L), (7L, 29L, 0L),
    (8L, 30L, 3L), (9L, 32L, 2L), (10L, 35L, 1L), (11L, 39L, 0L)
  ).toDF("id", "k", "u")

  test("pruneAudit: hand-derived values on a clustered zone key") {
    val got = ZoneMap.pruneAudit(tiny, expr("id div 4"), Seq(
        RangePred("mid", "k", 20L, 29L),   // exactly zone 1
        RangePred("edge", "k", 19L, 20L),  // straddles zones 0/1
        RangePred("u_all", "u", 1L, 2L),   // every zone has u in [1,2]
        RangePred("none", "k", 100L, 200L) // matches nothing
      )).collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("mid") === ((3L, 1L, 4L, 4L)))
    assert(got("edge") === ((3L, 2L, 8L, 2L)))
    assert(got("u_all") === ((3L, 3L, 12L, 6L)))
    assert(got("none") === ((3L, 0L, 0L, 0L)))
  }

  test("no false pruning: rows_scanned >= rows_match on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(1000).toLong))
    val preds = (1 to 6).map { i =>
      val lo = rnd.nextInt(900).toLong
      RangePred(s"p$i", "v", lo, lo + rnd.nextInt(200))
    }
    val audit = ZoneMap.pruneAudit(rows.toDF("id", "v"),
      expr("id div 64"), preds).collect()
    assert(audit.length === preds.size)
    audit.foreach { r =>
      assert(r.getLong(3) >= r.getLong(4),
        s"${r.getString(0)}: scanned ${r.getLong(3)} < match ${r.getLong(4)}")
      assert(r.getLong(2) <= r.getLong(1))
    }
  }
}
