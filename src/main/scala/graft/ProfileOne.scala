package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-job/stage wall+task-time profile of one query (dev tool, not
  * driver contract): run the query twice (run 1 warms JIT/codegen),
  * attach a listener for run 2, print each job's wall time and each
  * stage's task-time sum / max-task / task count. This is the
  * guide-§7 "which stage is the time going to" loop without the UI
  * (spark.ui.enabled=false everywhere in this sandbox).
  * Usage: scripts/run.sh graft.ProfileOne q_name [runs]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = TimeOne.perfSession()
    val fn = SparkEntry.queries(name)

    // warm-up run: JIT + codegen cache
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"warmup: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

    case class StageRow(stage: Int, name: String, tasks: Int,
                        taskTimeMs: Long, maxTaskMs: Long, wallMs: Long)
    val stages = mutable.Map[Int, StageRow]()
    val jobs = mutable.ArrayBuffer[(Int, Long, Seq[Int])]()
    val jobStart = mutable.Map[Int, (Long, Seq[Int])]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart(j.jobId) = (System.nanoTime(), j.stageIds)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.remove(j.jobId).foreach { case (t, sids) =>
          jobs += ((j.jobId, (System.nanoTime() - t) / 1000000, sids))
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(0L)
        stages(si.stageId) = StageRow(si.stageId,
          si.name.linesIterator.next().take(90), si.numTasks,
          0L, 0L, wall)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) stages.get(t.stageId).foreach { r =>
          // stage row may not exist yet (stage completes after tasks)
          ()
        }
    }
    // task metrics via stage accumulation instead: executorRunTime
    val taskTime = mutable.Map[Int, (Long, Long, Int)]() // stageId -> (sum, max, n)
    val tl = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val ms = if (t.taskMetrics != null) t.taskMetrics.executorRunTime else 0L
        val (s, m, n) = taskTime.getOrElse(t.stageId, (0L, 0L, 0))
        taskTime(t.stageId) = (s + ms, math.max(m, ms), n + 1)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.addSparkListener(tl)

    val runs = if (args.length > 1) args(1).toInt else 1
    def cg(): (Long, Long, Long) = {
      import org.apache.spark.metrics.source.CodegenMetrics._
      (METRIC_COMPILATION_TIME.getCount,
        METRIC_COMPILATION_TIME.getSnapshot.getValues.sum,
        METRIC_GENERATED_METHOD_BYTECODE_SIZE.getCount)
    }
    (1 to runs).foreach { i =>
      val (c0, t0s, m0) = cg()
      val t1 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val (c1, t1s, m1) = cg()
      println(f"profiled run $i: ${(System.nanoTime() - t1) / 1e9}%.2f s  " +
        f"janino: ${c1 - c0} compiles (~${t1s - t0s} ms hist-sum), ${m1 - m0} methods")
      if (i < runs) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    // let listener events drain
    Thread.sleep(500)

    // per-operator metrics of one more execution (the SQL-tab view,
    // UI-less): execute the plan directly and walk the final adaptive
    // plan's nodes for row counts and time metrics
    {
      val df = fn(spark, sfDir)
      val qe = df.queryExecution
      qe.executedPlan.execute().foreach(_ => ())
      def finalPlan(p: org.apache.spark.sql.execution.SparkPlan)
          : org.apache.spark.sql.execution.SparkPlan = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      println("== operator metrics (final plan)")
      def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
        val m = p.metrics.toSeq
          .filter { case (k, v) => v.value > 0 &&
            (k.contains("Time") || k.contains("time") || k == "numOutputRows") }
          .sortBy(_._1)
          .map { case (k, v) => s"$k=${v.value}" }.mkString(" ")
        println(("  " * depth) + p.nodeName + (if (m.nonEmpty) s"  [$m]" else ""))
        p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan, depth + 1)
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
            w.children.foreach(walk(_, depth + 1))
          case r: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(r.executedPlan, depth + 1)
          case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            walk(finalPlan(i.relation.cachedPlan), depth + 1)
          case _ => p.children.foreach(walk(_, depth + 1))
        }
      }
      walk(finalPlan(qe.executedPlan), 0)
    }

    println("== jobs (wall ms)")
    jobs.sortBy(-_._2).take(25).foreach { case (id, ms, sids) =>
      println(f"job $id%3d  $ms%6d ms  stages=${sids.mkString(",")}")
    }
    println("== stages by task-time (sum ms / max ms / tasks / wall ms)")
    val rows = stages.values.toSeq.map { r =>
      val (s, m, n) = taskTime.getOrElse(r.stage, (0L, 0L, 0))
      (r, s, m, n)
    }
    rows.sortBy(-_._2).take(30).foreach { case (r, s, m, n) =>
      println(f"stage ${r.stage}%3d  sum=$s%6d  max=$m%6d  tasks=$n%3d  wall=${r.wallMs}%6d  ${r.name}")
    }
    Runtime.getRuntime.halt(0)
  }
}
