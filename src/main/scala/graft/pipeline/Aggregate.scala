package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed / grouped aggregations — the reference's flagship semantics.
  *
  * Reference: `src/spark/transaction_processor.py:282-292` — tumbling
  * 1-hour event-time window per account with count/sum/avg. Re-expressed
  * over the driver's `events` table (ts/user_id/value stand in for
  * timestamp/account_id/amount).
  *
  * Scale notes: a single hash-aggregate with map-side partial aggregation;
  * one shuffle on (window, user_id). Sums are computed over
  * `decimal(18,2)` and cast back to double so the result is exact and
  * independent of partition/merge order — this is what makes the query
  * hash-stable against the DuckDB oracle AND reproducible on a
  * 1000-executor cluster where partial-agg order is nondeterministic.
  */
object Aggregate {

  /** Exact, order-independent double sum: route through decimal(18,2). */
  def moneySum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** A2 flagship: tumbling 1-hour window per user: count / sum / avg.
    * NULL-ts rows are excluded BY DEFINITION (a row with no event time
    * belongs to no window): Spark's window()/session_window() inject an
    * IsNotNull(ts) filter silently, so the filter is written explicitly
    * here — and as `ts IS NOT NULL` in every date_trunc/gaps-and-islands
    * oracle twin, which would otherwise RETAIN a NULL-window group and
    * diverge on the first NULL-ts record. */
  def hourlyUserAgg(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        moneySum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("user_id"),
        col("n_events"),
        col("sum_value"),
        (col("sum_value") / col("n_events")).as("avg_value"))
      .orderBy("window_start", "user_id")

  /** A3: sliding window (1 h window / 30 min slide,
    * `src/config/spark_config.yml:36-38` semantics at hour scale). */
  def slidingWindowAgg(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull) // see hourlyUserAgg: no window for no ts
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        moneySum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "user_id")

  /** Session-window aggregation: events of one user separated by gaps
    * under 30 minutes merge into one session (the declarative twin of
    * streaming/Sessionize's flatMapGroupsWithState — session_window
    * runs unchanged on batch and streaming frames). The oracle is the
    * classic gaps-and-islands SQL: a new session starts where the gap
    * from the previous event exceeds the timeout; sessions group by
    * the running count of session starts. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .filter(col("ts").isNotNull) // see hourlyUserAgg: no session for no ts
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        moneySum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        col("sw.start").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  val sqlSessionAgg: String =
    """WITH g AS (
         SELECT user_id, ts, value,
           -- inclusive <=: Spark merges an event landing exactly on the
           -- previous session's end (verified by unit test)
           CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
         FROM events WHERE ts IS NOT NULL
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       s AS (
         SELECT user_id, ts, value,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM g)
       SELECT user_id, min(ts) AS session_start,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM s GROUP BY user_id, session_id
       ORDER BY user_id, session_start"""
}
