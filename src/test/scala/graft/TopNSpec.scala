package graft

import org.apache.spark.sql.functions._

/** The bounded top-N ranking helper must order exactly like
  * `row_number() OVER (ORDER BY key)` — including ties resolved by the
  * key's tie-breaker column — while planning as TakeOrderedAndProject
  * (never a single-partition WindowExec). */
class TopNSpec extends SparkSpec {
  import spark.implicits._

  private def ranked(rows: Seq[(String, Long)], n: Int) =
    graft.util.TopN.rankedTopN(
      rows.toDF("word", "cnt").repartition(3),
      struct((-col("cnt")).as("nk"), col("word").as("wk")), n, "rnk")

  test("ranks by count desc with lexicographic tie-break, capped at n") {
    val out = ranked(
      Seq(("b", 5L), ("a", 5L), ("c", 9L), ("d", 1L), ("e", 5L)), 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, "c", 9L), (2, "a", 5L), (3, "b", 5L), (4, "e", 5L)))
  }

  test("n larger than input ranks everything; empty input yields no rows") {
    assert(ranked(Seq(("x", 1L)), 10).count() === 1)
    assert(ranked(Seq.empty, 10).count() === 0)
  }

  test("plans as TakeOrderedAndProject, no WindowExec") {
    val plan = ranked(Seq(("a", 1L), ("b", 2L)), 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Window"))
  }

  test("hll union: day sketches merge to the exact total at small cardinality") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val events = Seq(
      (1L, Some(10L), ts("2024-01-01 10:00:00")), (2L, Some(11L), ts("2024-01-01 11:00:00")),
      (3L, Some(10L), ts("2024-01-02 10:00:00")), (4L, Some(12L), ts("2024-01-02 11:00:00")),
      (5L, Option.empty[Long], ts("2024-01-02 12:00:00")) // null user excluded
    ).toDF("event_id", "user_id", "ts")
    val out = graft.pipeline.Windows.hllDailyDistinct(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("day:2024-01-01") === ((2L, true)))
    assert(out("day:2024-01-02") === ((2L, true)))
    assert(out("total") === ((3L, true))) // 10 overlaps both days
  }

  test("mad outliers: zero-MAD spike flagged, symmetric data clean") {
    val events = Seq(
      ("click", 1.0), ("click", 1.0), ("click", 1.0), ("click", 1.0), ("click", 100.0),
      ("view", 1.0), ("view", 2.0), ("view", 3.0)
    ).toDF("event_type", "value")
    val out = graft.pipeline.Windows.madOutliers(events).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out("click") === ((5L, 1.0, 0.0, 1L))) // MAD 0: any deviation flags
    assert(out("view") === ((3L, 2.0, 1.0, 0L)))
  }

  test("length buckets: pow-2 invariant against a spec reimplementation") {
    val rnd = new scala.util.Random(42)
    val counts = (0 until 300).map(_ => 1 + rnd.nextInt(2000))
    val docs = counts.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "), "en", "s", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    def capOf(n: Int): Long =
      if (n <= 1) 1L else 2L * java.lang.Integer.highestOneBit(n - 1)
    val expected = counts.groupBy(n => capOf(n))
      .map { case (cap, ns) => cap -> (ns.size.toLong, ns.map(_.toLong).sum) }
    val got = graft.llm.Curate.lengthBuckets(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
    got.keys.foreach(cap => assert((cap & (cap - 1)) == 0, s"cap $cap not pow2"))
  }

  test("winsorize: spike clamps to the interpolated p95, mass reconciles") {
    // the null row must vanish entirely — least/greatest skip NULLs,
    // so an unfiltered null would fabricate w = hi
    val events = ((1 to 10).map(_ => ("click", Option(1.0))) ++
      Seq(("click", Option(1000.0)), ("click", Option.empty[Double])))
      .toDF("event_type", "value")
    val r = graft.pipeline.Windows.winsorize(events).collect().head
    // 11 values: p95 interpolates between the 10th (1.0) and 11th (1000.0)
    // at fraction 0.5 -> 500.5; p05 stays 1.0
    assert(r.getLong(1) === 11L)
    assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 500.5)
    assert(r.getLong(4) === 0L && r.getLong(5) === 1L)
    assert(r.getDouble(6) === 1010.0 && r.getDouble(7) === 510.5)
  }

  test("skew report: hot key first, shares and x_avg exact, nulls excluded") {
    val events = (Seq.fill(6)(7L) ++ Seq(1L, 2L, 3L)).zipWithIndex
      .map { case (u, i) => (i.toLong, Option(u), "click", 1.0) }
      .:+((99L, Option.empty[Long], "click", 1.0)) // null key must not rank
      .toDF("event_id", "user_id", "event_type", "value")
    val out = graft.pipeline.Windows.skewReport(events, 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // 4 keys, 9 non-null rows: key 7 holds 6/9 of rows = 2.67x average
    assert(out.head === ((1, 7L, 6L, 6.0 / 9.0, 6.0 * 4.0 / 9.0)))
    assert(out.length === 3)
    assert(!out.exists(_._2 == 0L))
  }
}
