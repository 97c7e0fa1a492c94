package graft
import org.apache.spark.sql.SparkSession
object ExplainLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val q = args.headOption.getOrElse("q_sliding_window")
    for (i <- 1 to 3) time(s"$q run$i") {
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
    }
    val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString.split("\n").map(_.take(150)).take(25).mkString("\n"))
    spark.stop()
  }
}
