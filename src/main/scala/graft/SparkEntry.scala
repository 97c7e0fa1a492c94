package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is exposed as a named query over the
  * driver's parquet testdata, with a DuckDB-equivalent oracle SQL. All
  * queries end in a total ORDER BY on a unique key and stabilize double
  * sums through decimal so results are hash-deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_hourly_user_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2 flagship: tumbling 1h event-time window per user (transaction_processor.py:282-292)
    "q_hourly_user_agg" -> ((s, dir) =>
      pipeline.Aggregate.hourlyUserAgg(Tables.events(s, dir)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_hourly_user_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, user_id,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
