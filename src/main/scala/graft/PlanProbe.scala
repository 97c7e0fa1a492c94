package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q_vocab", "q_bigram_counts", "q_cms_topwords", "q_event_paths", "q_rarity_score", "q_quality_deciles_approx")) {
      println(s"===== $q")
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("TakeOrderedAndProject") || l.contains("Window") ||
        l.contains("Exchange") || l.contains("Sort") || l.contains("Limit"))
        .map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
