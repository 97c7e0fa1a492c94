package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal table shapes over the event stream: SCD2 validity
  * intervals, gap-filled daily series, and funnel conversion — the
  * warehouse-modeling operators a pipeline like the reference feeds
  * (its lineage/processing-timestamp model implies exactly these
  * read-side shapes; `src/utils/data_lineage.py:159-199`).
  *
  * Scale: every operator here shuffles once on its natural key
  * (user_id) and sorts within partitions — per-user partitions are
  * small and uniform at any corpus size. The gap-fill spine explode is
  * map-only.
  */
object Temporal {

  /** SCD2 snapshot build: each user's events become validity intervals
    * [valid_from, valid_to) via lead() — the slowly-changing-dimension
    * type-2 shape (current row = open interval). One shuffle on
    * user_id, one per-partition sort. */
  def scd2Snapshot(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").as("valid_from"))
      // NULLS LAST pinned explicitly: Spark's ASC default is NULLS
      // FIRST, DuckDB's is NULLS LAST — on a NULL-ts row the two
      // engines would otherwise build different lead() chains and
      // disagree on which row is_current. NULLS LAST is the meaningful
      // pick (an undated version can't be the start of history).
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy("user_id")
          .orderBy(col("valid_from").asc_nulls_last, col("event_id"))))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("user_id").asc_nulls_last,
        col("valid_from").asc_nulls_last, col("event_id"))

  val sqlScd2Snapshot: String =
    """SELECT user_id, event_id, value, ts AS valid_from,
       lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
         AS valid_to,
       lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
         IS NULL AS is_current
       FROM events
       ORDER BY user_id NULLS LAST, valid_from NULLS LAST, event_id"""

  /** Gap-filled per-user daily series: every calendar day between a
    * user's first and last event appears, zero-filled where no events
    * occurred — the densification step time-series features need
    * (without it, ROWS-frame windows silently skip empty days; see
    * Windows.volumeAnomaly). The spine explode (sequence of days per
    * user) is map-only over the per-user bounds aggregate; the join
    * back is keyed on (user_id, day). */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        col("n_events").isNotNull.as("observed"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("user_id", "day")
  }

  val sqlGapFillDaily: String =
    """WITH daily AS (
         SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
         FROM events GROUP BY 1, 2),
       bounds AS (
         SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
       spine AS (
         SELECT user_id,
           CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
         FROM bounds)
       SELECT s.user_id, s.day,
         d.n_events IS NOT NULL AS observed,
         CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events
       FROM spine s LEFT JOIN daily d
         ON s.user_id = d.user_id AND s.day = d.day
       ORDER BY s.user_id, s.day"""

  /** Conversion funnel: per user with at least one click, the first
    * click and the first purchase AT or AFTER it, plus the converted
    * flag. The classic product-analytics two-step funnel as one
    * aggregate + one conditional-min join — no per-user subqueries.
    * Durations are deliberately left as the two timestamps (exactly
    * comparable across engines) rather than a float difference. */
  def funnel(events: DataFrame): DataFrame = {
    val firstClick = events.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min(col("ts")).as("first_click"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
    firstClick.join(purchases, Seq("user_id"), "left")
      .groupBy("user_id", "first_click")
      .agg(min(when(col("pts") >= col("first_click"), col("pts")))
        .as("first_purchase"))
      .select(col("user_id"), col("first_click"), col("first_purchase"),
        col("first_purchase").isNotNull.as("converted"))
      .orderBy("user_id")
  }

  val sqlFunnel: String =
    """WITH fc AS (
         SELECT user_id, min(ts) AS first_click FROM events
         WHERE event_type = 'click' GROUP BY 1),
       fp AS (
         SELECT fc.user_id, fc.first_click,
           min(CASE WHEN e.ts >= fc.first_click THEN e.ts END) AS first_purchase
         FROM fc LEFT JOIN events e
           ON e.user_id = fc.user_id AND e.event_type = 'purchase'
         GROUP BY 1, 2)
       SELECT user_id, first_click, first_purchase,
         first_purchase IS NOT NULL AS converted
       FROM fp ORDER BY user_id"""

  /** Weekly cohort retention: users grouped by first-activity week
    * (Monday-truncated in both engines), counted as retained in each
    * later week they were active — the classic cohort triangle. Two
    * user-keyed shuffles (first-week aggregate + distinct activity),
    * then a counters-only rollup; week offsets are exact integer day
    * arithmetic, so no calendar-function drift can leak in. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val acts = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val cohorts = acts.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
    acts.join(cohorts, "user_id")
      .select(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val sqlCohortRetention: String =
    """WITH acts AS (
         SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
         FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       c AS (SELECT user_id, min(wk) AS cohort_week FROM acts GROUP BY 1)
       SELECT cohort_week,
         CAST(date_diff('day', cohort_week, wk) // 7 AS INTEGER) AS week_offset,
         count(*) AS n_users
       FROM acts JOIN c USING (user_id)
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Incremental aggregate maintenance: the daily (event_type, day)
    * summary kept as running partials, refreshed by aggregating ONLY
    * the new day's slice and re-merging — the merge-on-read /
    * materialized-view pattern that replaces full recomputes at
    * warehouse scale (the recompute reads one day; the merge reads the
    * compact summary). Partials carry DECIMAL sums end to end — the
    * merge must re-add exact partials, never doubles, or the merged
    * total depends on merge order. Oracle = the full recompute, so a
    * hash match proves merge == recompute exactly. */
  def incrementalDailySummary(events: DataFrame): DataFrame = {
    val typed = events
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), col("ts").cast("date").as("day"),
        col("value").cast("decimal(18,2)").as("v"))
    val cutoff = typed.agg(max(col("day")).as("cut"))
    val parts = typed.crossJoin(broadcast(cutoff))
      .withColumn("slice", when(col("day") < col("cut"), "base").otherwise("delta"))
      .groupBy("slice", "event_type", "day")
      .agg(count(col("v")).as("n"), sum(col("v")).as("sv"))
    parts
      .groupBy("event_type", "day")
      .agg(sum(col("n")).as("n_events"),
        sum(col("sv")).cast("double").as("sum_value"))
      .orderBy("event_type", "day")
  }

  val sqlIncrementalDailySummary: String =
    """SELECT event_type, CAST(ts AS DATE) AS day,
       count(value) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events
       WHERE event_type IS NOT NULL AND ts IS NOT NULL
       GROUP BY 1, 2 ORDER BY 1, 2"""
}
