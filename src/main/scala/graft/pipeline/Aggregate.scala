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

  /** A2 flagship: tumbling 1-hour window per user: count / sum / avg. */
  def hourlyUserAgg(events: DataFrame): DataFrame =
    events
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
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        moneySum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "user_id")
}
