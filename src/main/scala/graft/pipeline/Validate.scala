package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation stages — the reference's per-record predicates and
  * Great-Expectations-style batch expectations, re-expressed as pure
  * DataFrame stages.
  *
  * Reference semantics:
  *  - P4 validity predicate: conjunctive NOT-NULL checks + amount > 0
  *    (`src/spark/transaction_processor.py:229-235`)
  *  - P5 CASE valid/invalid (`transaction_processor.py:238-241`)
  *  - P7 enum membership + error strings (`src/models/transaction.py:112-139`)
  *  - A5 validation summary (`src/utils/transaction_validator.py:197-218`)
  *  - A6-A10 expectations (`transaction_validator.py:61-141`,
  *    `src/config/validation_config.yml:26-59`)
  *  - S8 dead-letter split (`src/config/kafka_config.yml:27-30`)
  *
  * The `events` table stands in for the transaction stream
  * (event_id/user_id/event_type/value ≙ transaction_id/account_id/
  * transaction_type/amount); `error` events play the invalid class.
  *
  * Scale: all predicates are narrow column expressions inside
  * whole-stage codegen; expectation aggregates are single
  * partial+final hash aggregates (one shuffle of a handful of rows).
  */
object Validate {

  /** Allowed "transaction types" — everything the generator emits except
    * the designated-invalid `error` class. */
  val allowedTypes: Seq[String] = Seq("click", "view", "purchase", "signup")

  /** P4: conjunctive validity predicate. Null-safe: a null in any
    * operand means "not proven valid" → false (SQL three-valued logic
    * would otherwise leave is_valid NULL for e.g. a null amount).
    * Parameterless like [[errorArray]]: built from unresolved col()
    * refs, resolved against whatever frame it is applied to. */
  def isValid: Column =
    coalesce(
      col("event_id").isNotNull && col("user_id").isNotNull &&
        col("value") > lit(0) && col("event_type").isin(allowedTypes: _*),
      lit(false))

  /** P7 error-string collection as a compacted array expression. */
  def errorArray: Column =
    array_compact(array(
      when(col("event_id").isNull, "missing transaction_id"),
      when(col("user_id").isNull, "missing account_id"),
      when(!(col("value") > lit(0)) || col("value").isNull, "invalid amount"),
      when(col("event_type").isNotNull &&
        !col("event_type").isin(allowedTypes: _*),
        concat(lit("invalid type: "), col("event_type")))
    ))

  /** P4+P5+P7: per-row validity flags, status, and error list.
    * The error array is projected as a '|'-joined canonical string so
    * the driver's pandas hash-compare (which cannot sort array cells)
    * stays applicable; n_errors preserves the count. */
  def validityFlags(events: DataFrame): DataFrame = {
    val valid = isValid
    events.select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      valid.as("is_valid"),
      when(valid, "valid").otherwise("invalid").as("validation_status"),
      errorArray.as("errs"))
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("is_valid"), col("validation_status"),
        concat_ws("|", col("errs")).as("validation_errors"),
        size(col("errs")).as("n_errors"))
      .orderBy("event_id")
  }

  /** GE-style validation-results artifact
    * (`transaction_validator.py:227-256`: per-record results + a
    * summary, persisted as JSON): per-record rows as JSON lines under
    * dir/results, the one-row summary (with a run timestamp) under
    * dir/summary. Distributed writes — no driver-side collect. */
  def saveValidationResults(events: DataFrame, dir: String): Unit = {
    validityFlags(events).write.mode("overwrite").json(s"$dir/results")
    validationSummary(events)
      .withColumn("timestamp",
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss"))
      .write.mode("overwrite").json(s"$dir/summary")
  }

  /** A5: batch validation summary — counts + success rate. */
  def validationSummary(events: DataFrame): DataFrame = {
    val valid = isValid
    events.agg(
      count(lit(1)).as("n_total"),
      count(when(valid, 1)).as("n_valid"),
      count(when(!valid, 1)).as("n_invalid"))
      .withColumn("success_rate",
        col("n_valid").cast("double") / col("n_total"))
  }

  /** A6: uniqueness expectation — keys appearing more than once. */
  def uniqueViolations(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_dup"))
      .filter(col("n_dup") > 1)
      .orderBy(key)

  /** A7: range expectation on an amount column — GE-style summary. */
  def rangeCheck(df: DataFrame, amount: String,
                 lo: Double, hi: Double): DataFrame =
    df.agg(
      count(lit(1)).as("n_total"),
      count(when(col(amount).isNotNull &&
        (col(amount) < lo || col(amount) > hi), 1)).as("n_violations"),
      min(col(amount)).as("min_amount"),
      max(col(amount)).as("max_amount"))

  /** A8: set-membership expectation — violator counts per value
    * (nulls ignored, GE convention). */
  def setMembershipViolations(df: DataFrame, c: String,
                              allowed: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(allowed: _*))
      .groupBy(col(c)).agg(count(lit(1)).as("n_bad"))
      .orderBy(c)

  /** A9: not-null expectation — null count per column, one row. */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("n_total"),
      cols.map(c => count(when(col(c).isNull, 1)).as(s"n_null_$c")): _*)

  /** A10: parseability expectation — timestamps must round-trip
    * through a string parse (GE expect_column_values_to_be_parseable,
    * validation_config.yml:42-43). */
  def parseCheck(df: DataFrame, tsCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_total"),
      count(when(to_timestamp(col(tsCol).cast("string")).isNull &&
        col(tsCol).isNotNull, 1)).as("n_unparseable"))

  /** A11: per-record history — filter by key, order by time (the
    * lineage read-back access pattern, data_lineage.py:159-199). */
  def userHistory(events: DataFrame, userId: Long): DataFrame =
    events.filter(col("user_id") === userId)
      .select("event_id", "ts", "event_type", "value")
      .orderBy("ts", "event_id")

  /** S8: dead-letter branch — the invalid records, routed aside. */
  def deadLetter(events: DataFrame): DataFrame =
    events.filter(!isValid)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")

  /** Deequ-style whole-table column profile: one row per column with
    * completeness (null rate), exact cardinality, and the length range
    * of a CANONICAL string rendering (stringification is pinned per
    * type — strftime pattern for timestamps, decimal(18,2) for the
    * money-ish double — because engine-default casts of
    * timestamps/doubles to text do not agree across engines and the
    * oracle hash-compares every cell).
    *
    * Shape: a map-only #cols× stack (explode of per-column structs),
    * then ONE hash aggregate; the distinct count partial-aggregates
    * map-side on (column, value). Exact cardinality is the profile's
    * cost center at 100 TB — the documented swap is
    * approx_count_distinct (same plan minus the distinct shuffle),
    * as in [[graft.pipeline.Windows.approxDistinctUsers]]. */
  def schemaProfile(events: DataFrame): DataFrame = {
    val enc: Seq[(String, Column)] = Seq(
      "event_id" -> col("event_id").cast("string"),
      "event_type" -> col("event_type"),
      "props" -> col("props"),
      "ts" -> date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
      "user_id" -> col("user_id").cast("string"),
      "value" -> col("value").cast("decimal(18,2)").cast("string"))
    events
      .select(explode(array(enc.map { case (n, c) =>
        struct(lit(n).as("col_name"), c.as("v")) }: _*)).as("s"))
      .select(col("s.col_name").as("col_name"), col("s.v").as("v"))
      .groupBy("col_name")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(length(col("v"))).cast("long").as("min_len"),
        max(length(col("v"))).cast("long").as("max_len"))
      .withColumn("completeness",
        (col("n_total") - col("n_null")).cast("double") / col("n_total").cast("double"))
      .orderBy("col_name")
  }

  val sqlSchemaProfile: String =
    """WITH st AS (
         SELECT 'event_id' AS col_name, CAST(event_id AS VARCHAR) AS v FROM events
         UNION ALL SELECT 'event_type', event_type FROM events
         UNION ALL SELECT 'props', props FROM events
         UNION ALL SELECT 'ts', strftime(ts, '%Y-%m-%d %H:%M:%S') FROM events
         UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
         UNION ALL SELECT 'value', CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) FROM events)
       SELECT col_name,
         CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
         CAST(min(length(v)) AS BIGINT) AS min_len,
         CAST(max(length(v)) AS BIGINT) AS max_len,
         CAST(count(*) - sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS completeness
       FROM st GROUP BY 1 ORDER BY 1"""
}
