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
