package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dev tool (not driver contract): the 10× measurement of the
  * STREAMING path (round 13, VERDICT r12 task 5 — every sf1 number in
  * SCALE.md was batch until now). Drives
  * [[streaming.Sources.trainingShardsQuery]] over the derived sf1
  * corpus split into N monotone triggers and records, per trigger:
  * wall time, the shard/pack partial-partition occupancy AFTER the
  * trigger (showing the round-13 auto-compaction fold), and the
  * read-side merge cost of the artifact
  * ([[llm.Curate.readTrainingShards]] full read) as the stream ages.
  *
  * Usage: SPARK_GRAFT_SF_DIR=target/sf1 scripts/run.sh \
  *          graft.StreamScale [nTriggers] [maxPartials]
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val spark = TimeOne.perfSession()
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val nTriggers = args.headOption.map(_.toInt).getOrElse(12)
    val maxPartials = args.drop(1).headOption.map(_.toInt)
      .getOrElse(streaming.Sources.ShardPartialMaxPartitions)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_scale")
      .toString
    // monotone doc_id arrival — the streaming pack contract
    val rows = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
      .as[(Long, String, String, String, Long)].collect()
    val per = math.ceil(rows.length.toDouble / nTriggers).toInt
    println(s"corpus=$sfDir docs=${rows.length} triggers=$nTriggers " +
      s"(~$per docs each) maxPartials=$maxPartials")
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val docs = mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = streaming.Sources.trainingShardsQuery(docs, s"$tmp/state",
      s"$tmp/shards", s"$tmp/ckpt", maxPartials = maxPartials)
    def nPartials(path: String, prefix: String): Int = {
      val d = new java.io.File(path)
      if (!d.exists()) 0
      else d.listFiles().count(f => f.isDirectory && f.getName.startsWith(prefix))
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    try {
      rows.grouped(per).zipWithIndex.foreach { case (slice, i) =>
        mem.addData(slice.toSeq: _*)
        val (_, trigS) = timed(q.processAllAvailable())
        val shardParts = nPartials(s"$tmp/shards", "micro_batch_id=")
        val packParts = nPartials(s"$tmp/state/pack", "batch_id=")
        val ((nSeqs, readS)) = timed(
          llm.Curate.readTrainingShards(spark, s"$tmp/shards").count()) match {
          case (n, s) => (n, s)
        }
        println(f"trigger $i%2d: ${slice.length}%5d docs  wall=$trigS%7.2fs" +
          f"  shard_partials=$shardParts%2d  pack_partials=$packParts%2d" +
          f"  artifact_seqs=$nSeqs%6d  read_merge=$readS%5.2fs")
      }
    } finally q.stop()
    // the artifact equals the batch capstone over everything streamed
    val (batchCnt, _) = timed(
      llm.Curate.trainingShards(Tables.documents(spark, sfDir)).count())
    val streamedCnt =
      llm.Curate.readTrainingShards(spark, s"$tmp/shards").count()
    println(s"streamed artifact rows=$streamedCnt batch capstone rows=$batchCnt")
    spark.stop()
  }
}
