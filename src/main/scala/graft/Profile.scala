package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for slow queries (dev tool, not driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    time("warmup count")(docs.count())
    time("words only")(docs.select(split(lower(col("text")), " ").as("words")).count())
    time("words+size filter")(docs.select(col("doc_id"), split(lower(col("text")), " ").as("words"))
      .filter(size(col("words")) >= 3).count())
    time("docShingles forced")(llm.TextPrep.docShingles(docs)
      .select(sum(size(col("shs")))).collect().head.getLong(0))
    time("shingleSets")(llm.TextPrep.shingleSets(docs).count())
    time("minhashSignatures")(llm.Dedup.minhashSignatures(docs).count())
    time("bandKeys via lsh cand")(llm.Dedup.minhashLshPairs(docs).count())
    time("full jaccardPairs")(llm.Dedup.jaccardPairs(docs, 0.5).count())
    spark.stop()
  }
}
