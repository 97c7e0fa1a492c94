package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // A 96-query session accumulates thousands of dead broadcast/
      // shuffle references; with the default BLOCKING cleaner each
      // removal is a synchronous RPC and new-stage broadcast creation
      // queues behind the flood — observed as pass-2 queries stalling
      // 40-200 s with every thread parked. Non-blocking cleanup keeps
      // stage submission off that queue.
      .config("spark.cleaner.referenceTracking.blocking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop write executes the FULL plan (count() would let Catalyst
    // eliminate sorts and prune projections — flattering but false).
    // Returns elapsed seconds, or -1.0 if the query threw — a failure
    // sentinel, so a fast exception can never masquerade as a fast run.
    // Per-query progress to a FILE (never stdout/stderr: the harness
    // that reads the final JSON line keeps only the output tail, and
    // extra lines would push the JSON out of its capture window).
    val progress = new java.io.PrintWriter(
      new java.io.FileWriter("bench_progress.log", /*append=*/ false), /*autoFlush=*/ true)
    def run(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // Queries may cache intermediates; drop them so later queries
      // aren't measured under accumulated heap pressure. clearCache()
      // only covers catalog-cached plans — localCheckpoint blocks live
      // at the RDD layer, so sweep those too.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val dt = (System.nanoTime() - t0) / 1e9
      progress.println(f"$name%-24s ${if (ok) f"$dt%8.2f" else "FAILED"}")
      if (ok) dt else -1.0
    }
    // Two FULL passes over the suite, min per query ACROSS passes —
    // not two back-to-back runs per query. Pass 1 doubles as JIT
    // warm-up (fresh generated code starts interpreted — measured
    // 30-100x slower until the compile flood drains). The cross-pass
    // structure is the contention defense this shared VM needs: a
    // host-scheduler stall lasting minutes covers BOTH back-to-back
    // runs of one query (round 1 recorded 128 s in-suite vs 1.2 s
    // isolated; round 2 inflated five queries ~20x), but to distort a
    // cross-pass min it would have to span the entire suite. Any
    // failed run marks the query failed (-1) regardless of times.
    // Wall-clock budget: this host has shown multi-minute scheduler
    // stalls (round 2 inflated five queries ~20x; a round-3 run sat
    // 28 min where the rerun took 9). Pass 1 always completes so every
    // query has a value; pass 2 and the straggler retries stop once
    // the budget is spent — graceful degradation (JIT-inflated pass-1
    // values for the tail) instead of a harness timeout with no JSON
    // line at all.
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1500").toDouble
    val wall0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - wall0) / 1e9
    val names = SparkEntry.queries.keys.toSeq
    val pass1 = names.map(n => n -> run(n, SparkEntry.queries(n))).toMap
    // Pass 2 visits queries SLOWEST-FIRST: if the budget cuts pass 2
    // short, the re-measurement reaches the most-inflated (most
    // steal-suspect) numbers before the ones already near the floor.
    var pass2Skipped = 0
    val pass2 = names.sortBy(n => -pass1(n)).map { n =>
      n -> (if (elapsedS < budgetS) run(n, SparkEntry.queries(n))
            else { pass2Skipped += 1; pass1(n) })
    }.toMap
    val best = names.map { n =>
      val (a, b) = (pass1(n), pass2(n))
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }.toMap
    // Targeted third try for stragglers: if a query's best is still
    // slow, re-measure once more — one more chance to land outside a
    // contention window. Never replaces a failure sentinel.
    val results = best.map { case (n, t) =>
      n -> (if (t > 5.0 && elapsedS < budgetS) {
              val r = run(n, SparkEntry.queries(n)); if (r >= 0) math.min(t, r) else -1.0
            } else t)
    }
    if (pass2Skipped > 0)
      progress.println(s"budget ${budgetS}s exhausted: $pass2Skipped pass-2 runs skipped")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }.toSeq
    // Any failure poisons the headline total: a suite with a broken
    // query must never report a healthy-looking number.
    val total = results.values.filter(_ >= 0).sum + (if (failed.nonEmpty) 1e9 else 0.0)
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // The harness that reads this line keeps only the LAST ~2000 chars of
    // output, and sbt appends a ~75-char "[success] ..." line after us —
    // a per-query map over ~80 queries at full double precision overflows
    // that window and the line is lost mid-JSON (this happened in round 2).
    // Budget: slowest-first entries until ~1500 chars of map; the fast
    // remainder is summarized, and the FULL map goes to bench_detail.json.
    val bySlow = results.toSeq.sortBy { case (_, v) => if (v < 0) Double.MinValue else -v }
    val sb = new StringBuilder
    var omitted = 0; var omittedSum = 0.0
    bySlow.foreach { case (k, v) =>
      val entry = "\"" + k + "\":" + f3(v)
      if (sb.length + entry.length + 1 <= 1500) {
        if (sb.nonEmpty) sb.append(','); sb.append(entry)
      } else { omitted += 1; omittedSum += math.max(v, 0.0) }
    }
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":{${sb.toString}},"omitted":$omitted,"omitted_sum":${f3(omittedSum)},"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    val full = results.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString(s"""{"total":${f3(total)},"sf":"$sfDir","queries":{""", ",", "}}")
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
