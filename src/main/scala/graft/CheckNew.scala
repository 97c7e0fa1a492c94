package graft

import org.apache.spark.sql.SparkSession

/** Targeted correctness check (dev tool, not driver contract): dump a
  * subset of queries + their oracle SQL so scripts/oracle_check.py can
  * compare just those, without paying for the full Verify sweep.
  *
  * Usage: scripts/run.sh graft.CheckNew <sfDir> <outDir> q_a q_b ...
  */
object CheckNew {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "pass at least one query name")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      SparkEntry.queries(q)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$q")
      println(s"wrote $q")
    }
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val json = names
      .map(q => "\"" + q + "\": " + mapper.writeValueAsString(SparkEntry.oracleSql(q)))
      .mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json.getBytes("UTF-8"))
    spark.stop()
  }
}
