package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Ordered for partial-failure survival (round 4's correctness artifact
  * came back EMPTY — the run died before anything comparable landed):
  * ALL stale query output is deleted up front, THEN oracle_sql.json is
  * written, so however early the process dies, whatever query parquet
  * exists is exactly this run's output and comparable — never a prior
  * round's leftovers; Spark's block-manager
  * files live under ./target (not /tmp, which the host reaps mid-run —
  * r4 lost a live shuffle index file that way and the JVM died); and the
  * session is rebuilt after any query failure so one session-level death
  * cannot cascade through the remaining dumps (r3's five-query tail
  * cascade).
  */
object Verify {

  private def newSession(cpus: String): SparkSession = {
    val localDir = new java.io.File("target/spark-local-verify").getAbsolutePath
    new java.io.File(localDir).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      // see Bench.scala: blocking cleaner RPCs stall stage submission
      // once a long session's garbage starts flushing
      .config("spark.cleaner.referenceTracking.blocking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    spark
  }

  def main(args: Array[String]): Unit = {
    // Optional third arg (local iteration only; the driver passes two):
    // comma-separated query names — dump and compare just those.
    val (sfDir, outDir, only) = args match {
      case Array(s, o)        => (s, o, None)
      case Array(s, o, names) => (s, o, Some(names.split(',').toSet))
      case _ =>
        System.err.println(
          "usage: graft.Verify <sfDir> <outDir> [q_name1,q_name2,...]")
        sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    new java.io.File(outDir).mkdirs()
    // Fail loud on a typo'd filter name: a silent empty selection would
    // run zero queries, overwrite oracle_sql.json with {}, and exit 0 —
    // a no-op masquerading as a green gate.
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s) in filter: ${unknown.toSeq.sorted.mkString(", ")}")
      // In iteration mode an oracle-less selection would compare nothing
      // and still print a green '0/0 passed' downstream — fail loud here.
      val unoracled = names -- SparkEntry.oracleSql.keySet
      require(unoracled.isEmpty,
        s"filtered query(ies) have no oracle SQL: ${unoracled.toSeq.sorted.mkString(", ")}")
    }
    val selected = SparkEntry.queries.filter {
      case (name, _) => only.forall(_.contains(name))
    }

    // Drop ALL stale query output up front, BEFORE oracle_sql.json lands:
    // if this run dies at query 10 of ~100, queries 11+ must not retain a
    // previous round's parquet to be compared against the fresh oracle
    // file as if current. EVERY known query dir is dropped — not just the
    // selected ones — so a filtered iteration run never leaves an outDir
    // in a mixed state (stale full-run parquet beside a shrunk
    // oracle_sql.json, mistakable for a full run).
    def deleteTree(dir: java.nio.file.Path): Unit =
      if (Files.exists(dir)) {
        Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
    SparkEntry.queries.keys.foreach(name => deleteTree(Paths.get(s"$outDir/$name")))

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // filter by `selected`, not a re-derived predicate: the dumped-query
    // set and the compared-query set must be the same set by construction
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val progress = new java.io.PrintWriter(
      new java.io.FileWriter("verify_progress.log", /*append=*/ false), /*autoFlush=*/ true)
    var spark = newSession(cpus)
    val t0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - t0) / 1e9

    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        progress.println(f"[${elapsedS}%8.1f] $name%-24s ok")
      } catch { case e: Throwable =>
        val first = Option(e.getMessage).getOrElse("").linesIterator
          .take(1).mkString.take(200)
        progress.println(f"[${elapsedS}%8.1f] $name%-24s FAILED  ${e.getClass.getSimpleName}: $first")
        System.err.println(s"[verify] $name failed: $first")
        try spark.stop() catch { case _: Throwable => () }
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        spark = newSession(cpus)
      }
      spark.catalog.clearCache()
      // localCheckpoint blocks live at the RDD layer; clearCache()
      // never drops them, and they'd accumulate across 90+ queries.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    progress.close()
    spark.stop()
  }
}
