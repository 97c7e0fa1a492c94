package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — an operator Spark SQL lacks natively:
  * for each left row, attach the most recent right row of the same key
  * with right.ts <= left.ts.
  *
  * Implementation is the single-shuffle union trick, the only shape
  * that scales: tag both sides, union, sort within key partitions by
  * (ts, side) — right rows sort before left rows at equal ts, giving
  * <= semantics — and carry the latest right payload forward with
  * last(ignoreNulls) over a running window. One shuffle on the key,
  * one sort; no per-row subquery, no range cross-join, no broadcast of
  * a fact-sized table. Left rows with no prior right row keep nulls
  * (left-join semantics).
  *
  * The right side is deduplicated to one row per (key, ts) first
  * (highest id wins) so the "most recent" row is well-defined — this
  * also makes the independently-written DuckDB ASOF JOIN oracle
  * deterministic.
  */
object Asof {

  /** For each purchase event: the same user's most recent click at or
    * before the purchase time. */
  def lastClickBeforePurchase(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clickDedup = Window.partitionBy("user_id", "ts")
      .orderBy(col("event_id").desc)
    // NULL-key/NULL-ts clicks are excluded from the lookup side: join
    // semantics (and the DuckDB ASOF LEFT JOIN twin) never match a NULL
    // key or satisfy ts >= NULL, but Window.partitionBy groups NULLs
    // together — without this filter a NULL-user purchase would inherit
    // an unrelated NULL-user click. NULL-key purchases stay (left-join
    // semantics) and get NULL asof columns: their partition has no
    // side-0 rows left.
    val clicks = events.filter(col("event_type") === "click" &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("rn", row_number().over(clickDedup))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))

    val l = purchases
      .withColumn("side", lit(1))
      .withColumn("click_id", lit(null).cast("long"))
      .withColumn("click_value", lit(null).cast("double"))
      .withColumn("click_ts", lit(null).cast("timestamp_ntz"))
    val r = clicks
      .withColumn("side", lit(0))
      .withColumn("event_id", lit(null).cast("long"))
      .withColumn("value", lit(null).cast("double"))
      .withColumn("click_ts", col("ts"))

    // right rows (side 0) sort before left rows at equal ts → "<=".
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("click_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("asof_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .withColumn("asof_click_value", last(col("click_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof_click_id").as("click_id"),
        col("asof_click_ts").as("click_ts"),
        col("asof_click_value").as("click_value"))
      .orderBy("event_id")
  }

  /** Range (interval) join, bucketed: per purchase, aggregate the same
    * user's events in the hour after it. A naive inequality join
    * degenerates to per-key nested loops; bucketing time into 1-hour
    * grains and probing (bucket, bucket+1) makes the join key
    * (user_id, bucket) — a bounded equi-join — with the exact range
    * predicate as a post-filter. Each event falls in exactly one
    * probed bucket, so no dedup is needed. The oracle is the plain
    * inequality join — independent implementation, same rows. */
  def eventsWithinHourAfterPurchase(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val e = events.select(col("user_id").as("e_user"), col("ts").as("ets"),
        col("value"))
      .withColumn("bucket", date_trunc("hour", col("ets")))
    val probes = p.withColumn("bucket",
      explode(array(date_trunc("hour", col("ts")),
        expr("date_trunc('hour', ts) + INTERVAL 1 HOUR"))))
    val agg = probes.join(e,
        col("user_id") === col("e_user") &&
          probes("bucket") === e("bucket") &&
          col("ets") > col("ts") &&
          col("ets") <= expr("ts + INTERVAL 1 HOUR"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_following"),
        Aggregate.moneySum(col("value")).as("sum_following"))
    p.select("event_id")
      .join(agg, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_following"), lit(0L)).as("n_following"),
        coalesce(col("sum_following"), lit(0.0)).as("sum_following"))
      .orderBy("event_id")
  }

  val sqlEventsWithinHourAfterPurchase: String =
    """WITH p AS (
         SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
       agg AS (
         SELECT p.event_id, count(*) AS n_following,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_following
         FROM p JOIN events e ON p.user_id = e.user_id
           AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
         GROUP BY 1)
       SELECT p.event_id, coalesce(n_following, 0) AS n_following,
         coalesce(sum_following, 0.0) AS sum_following
       FROM p LEFT JOIN agg USING (event_id) ORDER BY event_id"""

  /** DuckDB twin uses the engine's native ASOF LEFT JOIN — an
    * independent implementation of the same semantics. */
  val sqlLastClickBeforePurchase: String =
    """WITH p AS (
         SELECT event_id, user_id, ts, value FROM events
         WHERE event_type = 'purchase'),
       c AS (
         SELECT user_id, ts, event_id AS click_id, value AS click_value
         FROM (
           SELECT *, row_number() OVER (
             PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
           FROM events WHERE event_type = 'click')
         WHERE rn = 1)
       SELECT p.event_id, p.user_id, p.ts, p.value,
         c.click_id, c.ts AS click_ts, c.click_value
       FROM p ASOF LEFT JOIN c
         ON p.user_id = c.user_id AND p.ts >= c.ts
       ORDER BY p.event_id"""
}
