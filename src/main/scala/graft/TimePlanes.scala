package graft
import org.apache.spark.sql.SparkSession

/** Local perf-iteration helper for the sign-LSH signature-width knob:
  * time lshNearDupPairs / multiProbeLshPairs at a given numPlanes on a
  * given table dir, same session config and noop-write shape as
  * [[TimeOne]]. Exists to measure the density scaling documented in
  * SCALE.md ("Measured 10× scale step"): bucket occupancy is
  * n / 2^numPlanes, so the width must grow with log₂(corpus) to hold
  * in-bucket pair work constant. Not part of the driver contract.
  *
  * Usage: scripts/run.sh graft.TimePlanes <sfDir> <numPlanes> [mp|topk]
  */
object TimePlanes {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val numPlanes = args(1).toInt
    val multiProbe = args.length > 2 && args(2) == "mp"
    val spark = TimeOne.perfSession()
    val which =
      if (multiProbe) "multiProbeLshPairs"
      else if (args.length > 2 && args(2) == "topk") "lshTopKNeighbors"
      else "lshNearDupPairs"
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val emb = Tables.embeddings(spark, sfDir)
      val df = which match {
        case "multiProbeLshPairs" =>
          llm.Similarity.multiProbeLshPairs(emb, 0.3, numPlanes)
        case "lshTopKNeighbors" =>
          llm.Similarity.lshTopKNeighbors(emb, 5, numPlanes)
        case _ => llm.Similarity.lshNearDupPairs(emb, 0.3, numPlanes)
      }
      val rows = df.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$which planes=$numPlanes run$i: $s%.2f s ($rows rows)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    Runtime.getRuntime.halt(0)
  }
}
