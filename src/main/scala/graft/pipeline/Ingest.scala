package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion / serde stages — JSON decode, typed casts, Kafka-shaped
  * projections.
  *
  * Reference semantics:
  *  - P1 CAST(key/value AS STRING) off Kafka binary
  *    (`src/spark/transaction_processor.py:164`)
  *  - P2 from_json(value, schema) + star-expand (`:165-169`)
  *  - P3 to_timestamp casts + ingestion time (`:172-175`)
  *  - S2 Kafka sink projection key=account_id, value=to_json(struct(*))
  *    (`:187-197`)
  *  - S4 row-level JSON serde with null-stripping
  *    (`src/models/transaction.py:40-95`)
  *
  * The `events.props` JSON string plays the Kafka message value.
  * Scale: from_json/to_json are codegen'd row-local expressions — no
  * shuffle, fully pushdown-friendly (the parquet scan reads only the
  * referenced columns).
  */
object Ingest {

  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** P2: JSON decode + star-expand of the props payload. */
  def jsonDecode(events: DataFrame): DataFrame =
    events
      .withColumn("data", from_json(col("props"), propsSchema))
      .select(col("event_id"), col("event_type"), col("data.k").as("k"))
      .orderBy("event_id")

  /** P2+A2 composition: aggregate over a JSON-extracted field. */
  def jsonFieldAgg(events: DataFrame): DataFrame =
    jsonDecode(events)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k").cast("long")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** P2 at 100 TB: schema-on-read via VARIANT. `from_json` needs the
    * schema declared up front and re-parses the text per access;
    * `try_parse_json` parses each props payload ONCE into Spark 4's
    * binary variant encoding, from which `variant_get` extracts fields
    * without reparsing and without a declared schema — the engine-
    * native path for sparse, evolving event properties at corpus
    * scale (with parquet variant shredding, extraction pushes into
    * the scan). Row-local decode + one hash aggregate; `try_` at BOTH
    * steps — try_parse_json guards only parse failures, and a
    * well-formed payload whose field isn't castable ({"k":"abc"})
    * would still kill the job under strict variant_get — keeps any
    * malformed payload a NULL, not a job failure, matching the
    * dead-letter philosophy of the ingest path. */
  def variantFieldAgg(events: DataFrame): DataFrame =
    events
      .withColumn("v", try_parse_json(col("props")))
      .select(col("event_type"),
        try_variant_get(col("v"), "$.k", "int").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k").cast("long")).as("sum_k"),
        countDistinct(col("k")).as("n_distinct_k"))
      .orderBy("event_type")

  /** S2: Kafka-sink-shaped projection — (key, value) pair where value is
    * the full row serialized as JSON (null fields stripped, matching the
    * reference's serializer). Oracle-less: JSON field ordering is
    * engine-specific; covered by round-trip unit tests instead. */
  def kafkaShaped(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast("string").as("key"),
      to_json(struct(events.columns.map(col): _*)).as("value"))

  /** S4 inverse for tests: parse kafkaShaped back into columns. */
  def kafkaParse(df: DataFrame, schema: StructType): DataFrame =
    df.select(col("key"), from_json(col("value"), schema).as("data"))
      .select((col("key") +: schema.fieldNames.map(f => col(s"data.$f"))): _*)
}
