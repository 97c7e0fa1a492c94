package graft

/** Print the executed physical plan of named queries (dev tool, not
  * driver contract) — the manual side of [[PlanAudit]]: when the audit
  * flags a shape, this is how you look at it.
  * Usage: scripts/run.sh graft.PlanPrint q_a q_b ... */
object PlanPrint {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { q =>
      println(s"==== $q")
      // formatted mode (the judge-facing plans/r13 artifacts): numbered
      // operator list + per-operator details (PushedFilters, ReadSchema,
      // join strategy/build side, exchange partitioning)
      println(SparkEntry.queries(q)(spark, sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    Runtime.getRuntime.halt(0)
  }
}
