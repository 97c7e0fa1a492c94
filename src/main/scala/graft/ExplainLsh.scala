package graft
import org.apache.spark.sql.SparkSession
object ExplainLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val q = llm.Dedup.minhashLshPairs(docs)
    val n = q.count()
    println(s"ROWS=$n")
    // after execution, AQE final plan shows reuse
    println(q.queryExecution.executedPlan.toString.split("\n")
      .count(_.contains("ReusedExchange")) + " reused exchanges")
    spark.stop()
  }
}
