package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's read-only parquet testdata (TESTDATA.md).
  * Every query takes `(spark, sfDir)` and resolves tables here so the
  * same code runs at any scale factor. At cluster scale these would be
  * catalog tables / partitioned parquet roots; the API shape is the same.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) (rounds
    * 1–3) and plain TIMESTAMP(MICROS) (the regenerated round-5 data),
    * so branch on what the footer actually declares instead of assuming
    * either: NANOS is unreadable by Spark's vectorized reader, so it is
    * read as long (legacy conf) and converted to TIMESTAMP_NTZ at
    * microsecond precision (exactly DuckDB's behavior for
    * timestamp_ns); MICROS is read directly and only normalized to
    * TIMESTAMP_NTZ. Session TZ is pinned UTC either way.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
      case _ =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampNTZType))
    }
  }
  /** Same NANOS insurance for the other timestamp columns: if a future
    * testdata regeneration ships them as TIMESTAMP(NANOS) (as events.ts
    * did in rounds 1–3), Spark's reader surfaces them as long (with the
    * legacy conf) and every downstream query would otherwise die on a
    * type mismatch. On today's MICROS data this is a no-op — the column
    * type is left EXACTLY as read; only the otherwise-fatal long case
    * converts (ns → µs truncation, matching DuckDB's timestamp_ns
    * read). */
  private def tsDefensive(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(c, org.apache.spark.sql.functions.expr(
          s"CAST(timestamp_micros($c DIV 1000) AS TIMESTAMP_NTZ)"))
      case _ => df
    }

  def orders(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsDefensive(load(spark, sfDir, "orders"), "o_orderdate")
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsDefensive(load(spark, sfDir, "lineitem"), "l_shipdate")
  }
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
