package graft
import org.apache.spark.sql.SparkSession

/** Physical-plan red-flag sweep over every SparkEntry query: the
  * automated version of "explain everything and look for the shapes
  * that die at 100 TB". Flags:
  *  - CARTESIAN: CartesianProduct (a non-broadcast cross join);
  *  - BNLJ: BroadcastNestedLoopJoin (fine for single-row broadcast
  *    aggregates, fatal if either side is corpus-sized — review hits);
  *  - UNPART_WINDOW: a Window whose child exchange is
  *    SinglePartition — the whole input on one partition.
  * Plan shapes only, no execution — runs at sf0.001 in seconds. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val lines = plan.linesIterator.toArray
        val unpartWindow = lines.zipWithIndex.exists { case (l, i) =>
          l.contains("Window ") &&
            (i + 1 until math.min(i + 5, lines.length)).exists(j =>
              lines(j).contains("Exchange SinglePartition"))
        }
        val flags = Seq(
          "CARTESIAN" -> plan.contains("CartesianProduct"),
          "BNLJ" -> plan.contains("BroadcastNestedLoopJoin"),
          "UNPART_WINDOW" -> unpartWindow
        ).collect { case (f, true) => f }
        if (flags.nonEmpty) flagged += 1
        println(f"$name%-28s ${if (flags.isEmpty) "ok" else flags.mkString(",")}")
      } catch { case e: Throwable =>
        flagged += 1
        println(f"$name%-28s ERROR ${Option(e.getMessage).getOrElse("").take(80)}")
      }
    }
    println(s"flagged: $flagged")
    spark.stop()
  }
}
