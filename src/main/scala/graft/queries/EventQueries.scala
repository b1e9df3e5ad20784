package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.EventAnalytics

/** Product-analytics shapes over the event stream: the ordered
  * conversion funnel (with a conversion window) and the cohort-retention
  * triangle — [[graft.ops.EventAnalytics]] gated end-to-end. All time
  * arithmetic is integer epoch-µs; both plans are user-keyed with no
  * global ordering.
  */
object EventQueries {

  private val FunnelStages = Seq("signup", "view", "click", "purchase")

  private val ConversionWindowUs = 86400000000L // 24 h per stage — at
  // the fixture's event density this decays the funnel non-trivially at
  // both gate scales (sf0.01: 150→39→16→5)

  private val RetentionPeriodUs = 86400000000L // daily cohorts — weekly
  // periods saturate (every fixture user is active every week)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ordered conversion funnel: stage k strictly after stage k-1 and
    // within the 24 h conversion window of it; per-stage user counts.
    "events_funnel" -> ((s, dir) =>
      EventAnalytics.funnel(Tables.events(s, dir), "user_id", "event_type",
        "ts_us", FunnelStages, ConversionWindowUs)),

    // Daily cohort retention triangle: cohort = first active day,
    // retained at offset w iff any event on cohort_day + w.
    "events_retention_cohort" -> ((s, dir) =>
      EventAnalytics.retentionCohorts(Tables.events(s, dir), "user_id",
        "ts_us", RetentionPeriodUs)
        .withColumnRenamed("cohort_period", "cohort_day")
        .withColumnRenamed("period_offset", "day_offset")),

    // Where users stall: exact lower-median conversion latency per
    // funnel stage (integer rank median, no float percentile).
    "events_funnel_latency" -> ((s, dir) =>
      EventAnalytics.funnelLatency(Tables.events(s, dir), "user_id",
        "event_type", "ts_us", FunnelStages, ConversionWindowUs)),

    // Z-order layout key: the Morton interleave of (user, hour) — the
    // 2-D data-skipping sort key; exact magic-bit arithmetic shared with
    // the oracle. The write-side layout (range partition + sort on this
    // value) is asserted in CurationSelectSpec.
    "events_zorder_key" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        pmod(col("user_id"), lit(65536L)).as("zx"),
        pmod(expr("ts_us div 3600000000"), lit(65536L)).as("zy"))
        .withColumn("zvalue",
          graft.warehouse.ZOrder.zValue(col("zx"), col("zy"))))
  )

  val oracleSql: Map[String, String] = Map(
    "events_funnel" -> {
      val w = ConversionWindowUs
      val stageCtes = FunnelStages.zipWithIndex.drop(1).map { case (st, i) =>
        val k = i + 1
        s"""s$k AS (SELECT e.user_id, min(e.ts_us) AS t$k
           |  FROM e JOIN s$i ON e.user_id = s$i.user_id
           |    AND e.ts_us > s$i.t$i AND e.ts_us <= s$i.t$i + $w
           |  WHERE e.event_type = '$st' GROUP BY e.user_id)""".stripMargin
      }.mkString(", ")
      val unions = FunnelStages.zipWithIndex.map { case (st, i) =>
        s"SELECT ${i + 1} AS stage_no, '$st' AS stage, " +
          s"CAST(count(*) AS BIGINT) AS n_users FROM s${i + 1}"
      }.mkString(" UNION ALL ")
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
         |    FROM events),
         |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
         |  WHERE event_type = '${FunnelStages.head}' GROUP BY user_id),
         |$stageCtes
         |$unions""".stripMargin.replace("\n", " ")
    },

    "events_funnel_latency" -> {
      val w = ConversionWindowUs
      val stageCtes = FunnelStages.zipWithIndex.drop(1).map { case (st, i) =>
        val k = i + 1
        s"""s$k AS (SELECT e.user_id, min(e.ts_us) AS t$k
           |  FROM e JOIN s$i ON e.user_id = s$i.user_id
           |    AND e.ts_us > s$i.t$i AND e.ts_us <= s$i.t$i + $w
           |  WHERE e.event_type = '$st' GROUP BY e.user_id)""".stripMargin
      }.mkString(", ")
      val unions = FunnelStages.zipWithIndex.drop(1).map { case (st, i) =>
        val k = i + 1
        s"""SELECT $k AS stage_no, '$st' AS stage,
           |  CAST(n AS BIGINT) AS n_users, CAST(gap AS BIGINT) AS median_gap_us
           |FROM (SELECT s$k.t$k - s$i.t$i AS gap,
           |    row_number() OVER (ORDER BY s$k.t$k - s$i.t$i) AS rk,
           |    count(*) OVER () AS n
           |  FROM s$k JOIN s$i ON s$k.user_id = s$i.user_id)
           |WHERE rk = (n + 1) // 2""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
         |    FROM events),
         |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
         |  WHERE event_type = '${FunnelStages.head}' GROUP BY user_id),
         |$stageCtes
         |$unions""".stripMargin.replace("\n", " ")
    },

    "events_zorder_key" -> {
      val z = graft.warehouse.ZOrder.zValueSqlDuck("zx", "zy")
      s"""WITH b AS (SELECT event_id,
         |    user_id % 65536 AS zx,
         |    (epoch_us(ts) // 3600000000) % 65536 AS zy
         |  FROM events)
         |SELECT event_id, CAST(zx AS BIGINT) AS zx, CAST(zy AS BIGINT) AS zy,
         |  CAST($z AS BIGINT) AS zvalue FROM b""".stripMargin.replace("\n", " ")
    },

    "events_retention_cohort" ->
      s"""WITH p AS (SELECT DISTINCT user_id,
         |    epoch_us(ts) // $RetentionPeriodUs AS period FROM events),
         |f AS (SELECT user_id, min(period) AS cohort_day FROM p
         |  GROUP BY user_id)
         |SELECT f.cohort_day, p.period - f.cohort_day AS day_offset,
         |  CAST(count(*) AS BIGINT) AS n_users
         |FROM p JOIN f ON p.user_id = f.user_id
         |GROUP BY f.cohort_day, p.period - f.cohort_day"""
        .stripMargin.replace("\n", " ")
  )
}
