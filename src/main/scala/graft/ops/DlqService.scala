package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dead-letter-queue dataflow (reference `src/services/dlq_service.py`,
  * model `src/models/dlq_record.py`): listing with filters + pagination,
  * stats, replay selection and resolution marking. All set-at-a-time.
  */
object DlqService {

  val ResolutionStatuses = Seq("PENDING", "RETRYING", "MANUAL_RESOLVED", "ABANDONED")

  /** Filtered, ordered, paginated listing (`dlq_service.py:83-115`):
    * ORDER BY failed_at DESC LIMIT n OFFSET m with optional filters.
    */
  def list(dlq: DataFrame, filters: Seq[Column], limit: Int, offset: Int): DataFrame =
    filters.foldLeft(dlq)(_.filter(_))
      .orderBy(col("failed_at_us").desc, col("event_id"))
      .offset(offset).limit(limit)

  /** Stats (`dlq_service.py:375-443`): counts by error type and
    * resolution status in one cube pass; pass the source-table column
    * (`tableCol`) to add the reference's by-table dimension — the
    * two-column default is the oracle-gated shape (`cdc_dlq_stats`), and
    * deployments with per-table DLQ directories already carry the table
    * in the path.
    */
  def stats(dlq: DataFrame, tableCol: Option[String] = None): DataFrame =
    tableCol match {
      case Some(t) =>
        dlq.cube(col("error_type"), col("resolution_status"), col(t))
          .agg(count(lit(1)).as("n"))
      case None =>
        dlq.cube(col("error_type"), col("resolution_status")).agg(count(lit(1)).as("n"))
    }

  /** Replay (`dlq_service.py:165-301`): select records by id, serialize
    * back to the event wire format (S14 shape: `to_json(struct(*))` → the
    * original topic), and return both the outbound events and the updated
    * DLQ state (MANUAL_RESOLVED + resolved_at).
    */
  def replay(dlq: DataFrame, ids: Seq[Long], nowUs: Long): (DataFrame, DataFrame) = {
    val selected = dlq.filter(col("event_id").isin(ids.map(Long.box): _*))
    val outbound = selected.select(
      col("event_id").cast("string").as("key"),
      to_json(struct(selected.columns.map(col).toIndexedSeq: _*)).as("value"))
    // Prior resolutions are preserved: only the selected ids get the new
    // resolved_at (reference updates only WHERE id = ANY(%s),
    // dlq_service.py:246-255). Older DLQ fixtures may predate the column.
    val prior =
      if (dlq.columns.contains("resolved_at_us")) col("resolved_at_us")
      else lit(null).cast("long")
    val updated = dlq.withColumn("resolution_status",
        when(col("event_id").isin(ids.map(Long.box): _*), lit("MANUAL_RESOLVED"))
          .otherwise(col("resolution_status")))
      .withColumn("resolved_at_us",
        when(col("event_id").isin(ids.map(Long.box): _*), lit(nowUs))
          .otherwise(prior))
    (outbound, updated)
  }
}
