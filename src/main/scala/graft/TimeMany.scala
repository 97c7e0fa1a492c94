package graft

/** Batch min-of-N timer for a comma-separated query list in ONE JVM
  * (dev tool, not driver contract): pass-1 over the list warms
  * JIT/codegen, then `runs` timed passes; prints each query's min —
  * the same steady-state statistic bench_floor.json records, at a
  * fraction of a full Bench run. Usage:
  *   SPARK_GRAFT_CPUS=32 scripts/run.sh graft.TimeMany q_a,q_b [runs]
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = TimeOne.perfSession()
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val best = scala.collection.mutable.Map[String, Double]()
    for (r <- 0 to runs; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      if (r > 0) best(n) = math.min(best.getOrElse(n, Double.MaxValue), s)
      sweep()
    }
    names.foreach(n => println(f"$n%-28s min=${best(n)}%6.2f s"))
    Runtime.getRuntime.halt(0)
  }
}
