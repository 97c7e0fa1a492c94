package graft
import org.apache.spark.sql.SparkSession

/** Local perf-iteration helper: run ONE query from SparkEntry.queries
  * with the Bench session config and the same full-plan noop write,
  * print cold and warm timings. Not part of the driver contract. */
object TimeOne {

  /** The shared perf-harness session: ONE definition of the
    * local[cpus]/shuffle-partitions/local-dir/cleaner config, so a
    * tuning change can never silently diverge [[TimeOne]] and
    * [[TimePlanes]] measurements. */
  def perfSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = new java.io.File("target/spark-local-timeone").getAbsolutePath
    new java.io.File(localDir).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Round 13 (guide §2.2 "let AQE coalesce small partitions"):
      // respect the advisory partition size instead of parallelism
      // when coalescing post-shuffle reads — Spark's own docs
      // recommend false; the default true pins every tiny shuffle at
      // `shuffle.partitions` tasks, and the suite's iterative queries
      // (PageRank, connected components, BPE rounds) pay per-task
      // fixed overhead ~10× their actual row work. Scale-adaptive by
      // mechanism: at real shuffle sizes AQE targets the advisory
      // bytes and parallelism returns on its own.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // The default 100-entry codegen class cache thrashes across a
      // 210-query suite (~10 codegen units each): every re-measured
      // run pays its janino compiles again. A long-lived analytics
      // service keeps compiled classes hot; so does the bench.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.cleaner.referenceTracking.blocking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.registerAll(spark)
    spark
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = perfSession()
    val fn = SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name run$i: $s%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    Runtime.getRuntime.halt(0)
  }
}
