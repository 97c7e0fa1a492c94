package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor (dev tool): prints the physical-plan properties that
  * matter at scale for each registered query — scan pushdown/pruning,
  * join strategies, exchange count, whole-stage codegen coverage. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = args.headOption
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_ == name)) {
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.executedPlan.toString
          def n(p: String) = plan.split("\n").count(_.contains(p))
          val scans = plan.split("\n").filter(_.contains("FileScan parquet"))
          val readCols = scans.map { s =>
            val i = s.indexOf("ReadSchema: ")
            if (i >= 0) s.substring(i + 12).take(90) else "?"
          }
          val wsc = plan.split("\n").count(_.trim.matches("^[+:\\-\\s]*\\*\\(\\d+\\).*"))
          println(f"$name%-24s ex=${n("Exchange")}%2d bhj=${n("BroadcastHashJoin")} " +
            f"smj=${n("SortMergeJoin")} bnlj=${n("BroadcastNestedLoop")} " +
            f"wsc=$wsc%2d scans=${scans.length}")
          if (only.isDefined) {
            readCols.foreach(c => println(s"   read: $c"))
            println(plan.split("\n").take(60).mkString("\n"))
          }
        } catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage.take(100)}") }
      }
    }
    spark.stop()
  }
}
