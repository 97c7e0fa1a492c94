package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Generator
import graft.streaming.{Sources, StreamPipeline}

/** End-to-end streaming demo: synthetic transactions → JSON files →
  * file streaming source → parse/validate/enrich → windowed agg +
  * dead-letter dual sink → parquet. Exercises the full streaming path
  * without Kafka (same stages; the Kafka reader/writer differ only in
  * source/sink format options). */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_demo").toString

    // Producer side: generator → JSON files (stands in for the Kafka topic).
    Generator.transactions(spark, n)
      .write.mode("overwrite").json(s"$tmp/in")

    // Consumer side: file streaming source → full pipeline.
    val raw = Sources.jsonDirReader(spark, s"$tmp/in")
    val typed = StreamPipeline.enrich(StreamPipeline.typed(raw))

    val dual = Sources.dualSinkQuery(typed, s"$tmp/main", s"$tmp/dead", s"$tmp/ckpt1")
    val agg = StreamPipeline.windowedAgg(
      StreamPipeline.validate(typed).filter(col("is_valid")))
    val aggQ = agg.writeStream.format("parquet")
      .option("path", s"$tmp/agg").option("checkpointLocation", s"$tmp/ckpt2")
      .outputMode("append").start()

    dual.processAllAvailable(); dual.stop()
    aggQ.processAllAvailable(); aggQ.stop()

    val nMain = spark.read.parquet(s"$tmp/main").count()
    val nDead = try spark.read.parquet(s"$tmp/dead").count() catch { case _: Throwable => 0L }
    // append-mode agg emits only watermark-closed windows; count distinct accounts seen
    val nAgg = try spark.read.parquet(s"$tmp/agg").count() catch { case _: Throwable => 0L }
    println(s"STREAM_DEMO main=$nMain dead=$nDead agg_rows=$nAgg total=${nMain + nDead}")
    println(s"categories: " + spark.read.parquet(s"$tmp/main")
      .groupBy("transaction_category").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", "))
    spark.stop()
    if (nMain + nDead != n) sys.exit(1)
  }
}
