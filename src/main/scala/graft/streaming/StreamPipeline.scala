package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Schemas

/** The reference's flagship streaming pipeline
  * (`src/spark/transaction_processor.py:146-294`) as pure
  * `DataFrame => DataFrame` stages. Structured Streaming's unified API
  * means every stage here runs unchanged on a batch frame (unit tests,
  * oracle) or a streaming frame (MemoryStream / Kafka).
  *
  * Source/sink wiring (the only streaming-only parts) live in
  * [[Sources]]; stateful sessionization in [[Sessionize]].
  */
object StreamPipeline {

  /** P1+P2: Kafka-shaped (key, value) → typed columns. CAST key,
    * from_json(value) against the declared schema (permissive: missing
    * fields → null), star-expand. (`transaction_processor.py:164-169`) */
  def parse(kafkaShaped: DataFrame): DataFrame =
    kafkaShaped
      .selectExpr("CAST(key AS STRING) AS kafka_key", "CAST(value AS STRING) AS json")
      .withColumn("data", from_json(col("json"), Schemas.transactionSchema))
      .select(col("kafka_key") +: Schemas.transactionSchema.fieldNames.map(f => col(s"data.$f")): _*)

  /** P3: event/processing/ingestion times. (`transaction_processor.py:172-175`) */
  def typed(parsed: DataFrame): DataFrame =
    parsed
      .withColumn("event_time", to_timestamp(col("timestamp")))
      .withColumn("processing_time", to_timestamp(col("processing_timestamp")))
      .withColumn("ingestion_time", current_timestamp())

  /** P4 validity predicate. (`transaction_processor.py:229-235`) */
  val isValid: Column =
    col("transaction_id").isNotNull && col("account_id").isNotNull &&
      col("transaction_type").isNotNull && col("amount").isNotNull &&
      col("amount") > 0

  /** P4+P5: validity flag + status. (`transaction_processor.py:229-241`) */
  def validate(df: DataFrame): DataFrame =
    df.withColumn("is_valid", isValid)
      .withColumn("validation_result", when(col("is_valid"), "valid").otherwise("invalid"))

  /** Failures worth re-ingesting (the reference's `banking.retry` topic,
    * `src/config/kafka_config.yml:28-30`): the record itself is well-
    * formed but its account is unknown — the late-arriving-dimension
    * case, where a re-play after the dim propagates can succeed. A bad
    * amount or missing transaction_id can never heal and goes straight
    * to dead-letter. */
  val isRetryableFailure: Column =
    col("transaction_id").isNotNull && col("transaction_type").isNotNull &&
      col("amount").isNotNull && col("amount") > 0 &&
      col("account_id").isNull

  /** Three-way routing with a bounded retry loop: (valid, retry, dead).
    * `retry_count` tracks re-ingestions (absent → 0); a retryable record
    * is parked at most `maxRetries` times, then dead-letters — the bound
    * that guarantees the feedback loop terminates. */
  def retrySplit(df: DataFrame, maxRetries: Int): (DataFrame, DataFrame, DataFrame) = {
    val withCount =
      if (df.columns.contains("retry_count")) df
      else df.withColumn("retry_count", lit(0))
    val v = validate(withCount)
    val retryNow = isRetryableFailure && col("retry_count") < maxRetries
    (v.filter(col("is_valid")),
      v.filter(!col("is_valid") && retryNow),
      v.filter(!col("is_valid") && !retryNow))
  }

  /** P6: transaction_category — the reference's nested CASE exactly
    * (deposit>1000, withdrawal>500, payment>100 → large_*, else
    * regular_* for those three types, passthrough for any other;
    * `transaction_processor.py:256-265`). */
  def enrich(df: DataFrame): DataFrame =
    df.withColumn("transaction_category",
      when(col("transaction_type") === "deposit",
        when(col("amount") > 1000, "large_deposit").otherwise("regular_deposit"))
        .when(col("transaction_type") === "withdrawal",
          when(col("amount") > 500, "large_withdrawal").otherwise("regular_withdrawal"))
        .when(col("transaction_type") === "payment",
          when(col("amount") > 100, "large_payment").otherwise("regular_payment"))
        .otherwise(col("transaction_type")))

  /** P8 realized: broadcast join with the accounts dimension, filling
    * customer_id and folding account fields into metadata
    * (`src/models/transaction.py:97-110`; stubbed in the reference at
    * `transaction_processor.py:267`). */
  def enrichWithAccounts(df: DataFrame, accounts: DataFrame): DataFrame =
    df.join(broadcast(accounts.withColumnRenamed("customer_id", "acct_customer_id")),
        Seq("account_id"), "left")
      .withColumn("customer_id", coalesce(col("customer_id"), col("acct_customer_id")))
      .withColumn("metadata",
        when(col("account_type").isNotNull,
          map_concat(coalesce(col("metadata"), map()),
            map(lit("account_type"), col("account_type"),
              lit("account_status"), col("account_status"))))
          .otherwise(col("metadata")))
      .withColumn("enrichment_status",
        when(col("account_type").isNotNull, "enriched_with_account")
          .otherwise(lit("no_account_info")))
      .drop("acct_customer_id", "account_type", "account_status")

  /** A1+A2 flagship: watermarked tumbling 1 h window per account with
    * count/sum/avg (`transaction_processor.py:282-292`). Streaming-safe:
    * in append mode the 30 min watermark bounds state. */
  def windowedAgg(df: DataFrame,
                  watermark: String = "30 minutes",
                  window_ : String = "1 hour"): DataFrame =
    df.withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("account_id"))
      .agg(
        count(col("transaction_id")).as("transaction_count"),
        sum(col("amount")).as("total_amount"),
        avg(col("amount")).as("avg_amount"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("account_id"), col("transaction_count"),
        col("total_amount"), col("avg_amount"))

  /** Declarative sessionization: Spark's native `session_window`
    * aggregation — the engine's own dynamic-gap windows, with session
    * MERGING handled inside the streaming state store rather than by
    * hand-written state logic. The declarative twin of
    * [[Sessionize]] (flatMapGroupsWithState): same sessions, but the
    * plan stays whole-stage relational, the watermark both bounds
    * state and emits closed sessions in append mode, and at 100 TB
    * the state is keyed by (account, open-session) — never a full
    * history. Prefer this form unless per-event custom state (the
    * funnel tracker) is genuinely needed.
    */
  def sessionWindowAgg(df: DataFrame,
                       gap: String = "30 minutes",
                       watermark: String = "30 minutes"): DataFrame =
    df.withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("account_id"))
      .agg(
        count(col("transaction_id")).as("n_txns"),
        sum(col("amount")).as("total_amount"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("account_id"), col("n_txns"), col("total_amount"))

  /** S2: Kafka-sink shape — key = account_id, value = full row JSON
    * (null-stripped by to_json). (`transaction_processor.py:187-197`) */
  def kafkaSinkShape(df: DataFrame): DataFrame =
    df.select(
      col("account_id").cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Streaming exact dedup: the uniqueness expectation as a streaming
    * operator — duplicate transaction_ids arriving within the
    * watermark horizon are dropped, with state bounded by the
    * watermark (dropDuplicatesWithinWatermark evicts keys older than
    * the horizon; an unbounded dropDuplicates would grow state
    * forever on a 100 TB stream).
    *
    * NULL-keyed rows BYPASS the dedup: Spark's dedup treats NULL keys
    * as equal, so without the split every malformed record with a
    * null transaction_id after the first would be silently discarded —
    * losing exactly the rows the downstream dead-letter route exists
    * to preserve. They flow through unchanged (two distinct null-id
    * records are not "duplicates" of each other in any meaningful
    * sense) and dead-letter downstream. */
  def dedupStream(df: DataFrame, watermark: String = "30 minutes"): DataFrame = {
    val wm = df.withWatermark("event_time", watermark)
    wm.filter(col("transaction_id").isNotNull)
      .dropDuplicatesWithinWatermark("transaction_id")
      .unionByName(wm.filter(col("transaction_id").isNull))
  }

  /** Stream-stream interval join (fraud-pattern correlation): every
    * transaction that follows a large transaction on the same account
    * within `horizon`. Both inputs are watermarked and the join
    * predicate bounds each side's event time relative to the other —
    * the two conditions Spark needs to evict join state, so an inner
    * stream-stream join runs with bounded memory on an unbounded
    * stream. (Downstream of the reference's alerts route,
    * `src/config/kafka_config.yml:25` — the correlation its alert
    * consumers perform.)
    *
    * The same code runs on batch frames (watermarks are no-ops),
    * which is how the unit oracle checks it. */
  def followsLargeTxn(txns: DataFrame,
                      threshold: Double = 1000.0,
                      watermark: String = "30 minutes",
                      horizon: String = "1 hour"): DataFrame = {
    val large = txns
      .select(col("account_id").as("l_account_id"),
        col("transaction_id").as("large_id"),
        col("amount").as("large_amount"),
        col("event_time").as("large_time"))
      .filter(col("large_amount") > threshold)
      .withWatermark("large_time", watermark)
    val follow = txns
      .select(col("account_id").as("f_account_id"),
        col("transaction_id").as("follow_id"),
        col("amount").as("follow_amount"),
        col("event_time").as("follow_time"))
      .withWatermark("follow_time", watermark)
    large.join(follow,
        col("l_account_id") === col("f_account_id") &&
          col("follow_time") > col("large_time") &&
          col("follow_time") <= col("large_time") + expr(s"INTERVAL $horizon"))
      .select(col("l_account_id").as("account_id"),
        col("large_id"), col("follow_id"),
        col("large_amount"), col("follow_amount"),
        col("large_time"), col("follow_time"))
  }

  /** S8: dead-letter routing — returns (valid, deadLetter). In
    * streaming both branches run off the same source; with foreachBatch
    * a single pass writes both. */
  def deadLetterSplit(df: DataFrame): (DataFrame, DataFrame) = {
    val validated = validate(df)
    (validated.filter(col("is_valid")), validated.filter(!col("is_valid")))
  }

  /** Full parse→type→validate→enrich chain (the reference's
    * start_streaming body before aggregation). */
  def pipeline(kafkaShaped: DataFrame): DataFrame =
    enrich(validate(typed(parse(kafkaShaped))))
}
