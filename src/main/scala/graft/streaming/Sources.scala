package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Streaming source/sink wiring — the reference's Kafka topology
  * (`src/spark/transaction_processor.py:154-216`,
  * `src/config/kafka_config.yml`) mapped to Structured Streaming.
  *
  * Kafka itself is not running in this environment; the Kafka builders
  * return fully-configured readers/writers (exercised to the point of
  * plan construction in tests), and file/memory sources drive the same
  * stages end-to-end for executable coverage.
  */
object Sources {

  /** S1: Kafka streaming source — subscribe from earliest
    * (`transaction_processor.py:154-160`). */
  def kafkaReader(spark: SparkSession, brokers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()

  /** S2: Kafka streaming sink — checkpointed, append mode, 10 s
    * processing-time trigger (`transaction_processor.py:187-205`,
    * `spark_config.yml:46-47`). */
  def kafkaWriter(df: DataFrame, brokers: String, topic: String,
                  checkpoint: String): DataStreamWriter[Row] =
    StreamPipeline.kafkaSinkShape(df).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("10 seconds"))

  /** File-based streaming source over a directory of JSON transaction
    * files — same schema path as the Kafka value column. */
  def jsonDirReader(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(graft.pipeline.Schemas.transactionSchema)
      .json(dir)

  /** S8: one-pass dual-sink via foreachBatch — valid records to the
    * main sink, invalid to the dead-letter sink (parquet dirs standing
    * in for the banking.processed / banking.deadletter topics,
    * `kafka_config.yml:24,29`). */
  def dualSinkQuery(parsed: DataFrame, mainDir: String, deadDir: String,
                    checkpoint: String): StreamingQuery =
    parsed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (valid, dead) = StreamPipeline.deadLetterSplit(batch)
        valid.write.mode("append").parquet(mainDir)
        dead.write.mode("append").parquet(deadDir)
        ()
      }
      .start()

  /** S7: partitioned warehouse sink layout
    * (`spark_config.yml:50-69` — transactions by year/month/day). */
  def writeWarehouse(df: DataFrame, path: String): Unit =
    df.withColumn("year", year(col("event_time")))
      .withColumn("month", month(col("event_time")))
      .withColumn("day", dayofmonth(col("event_time")))
      .write.mode("append")
      .partitionBy("year", "month", "day")
      .parquet(path)
}
