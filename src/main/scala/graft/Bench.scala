package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop write executes the FULL plan (count() would let Catalyst
    // eliminate sorts and prune projections — flattering but false).
    // Returns elapsed seconds, or -1.0 if the query threw — a failure
    // sentinel, so a fast exception can never masquerade as a fast run.
    def run(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // Queries may cache intermediates; drop them so later queries
      // aren't measured under accumulated heap pressure.
      spark.catalog.clearCache()
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // Two runs, report the min. Run 1 doubles as JIT warm-up (fresh
      // generated code starts interpreted — measured 30-100x slower
      // until the session's compile flood drains; a real deployment
      // amortizes codegen over billions of rows). Min-of-N also strips
      // host-scheduler noise, which on this shared VM can inflate a
      // single run by an order of magnitude. Any failed run marks the
      // query failed (-1) regardless of the other run's time.
      val (r1, r2) = (run(name, fn), run(name, fn))
      name -> (if (r1 < 0 || r2 < 0) -1.0 else math.min(r1, r2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    // Any failure poisons the headline total: a suite with a broken
    // query must never report a healthy-looking number.
    val total = results.values.filter(_ >= 0).sum + (if (failed.nonEmpty) 1e9 else 0.0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
