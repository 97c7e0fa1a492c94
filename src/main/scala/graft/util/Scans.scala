package graft.util

import org.apache.spark.sql.DataFrame

/** Scan fan-out for unsplittable inputs (round 13, guide §2.5 "input
  * skew: one huge unsplittable file — repartition immediately after
  * the read").
  *
  * The driver testdata ships each table as ONE parquet row group, so a
  * scan is ONE task no matter the core count, and every narrow
  * computation stacked on it — media encode/decode, shingle hashing,
  * token explodes — runs single-core. [[fanOut]] round-robins the rows
  * up to the session's default parallelism, guarded so a source that
  * already carries enough partitions (any real corpus) is untouched:
  * scale-adaptive by construction, not a local tuning constant.
  *
  * Apply it ONLY at roots feeding heavy per-row compute with SMALL
  * aggregation state. It is deliberately NOT in `Tables.load`: fanning
  * out a scan that feeds a partial aggregate multiplies the aggregate's
  * per-task state by the task count — measured catastrophically on
  * q_approx_distinct, where the distinct-agg rewrite keeps a ~22 KB
  * rsd-0.01 HLL buffer per (event_type, user_id) group and 32 fanned
  * tasks turned 5k buffers into 160k (2.3 s → 15 s). Row placement
  * never changes results here: every query ends in a total ORDER BY
  * and double sums are decimal-stabilized by suite rule.
  */
object Scans {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
