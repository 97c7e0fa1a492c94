package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Validate

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // (event_id, user_id, event_type, value)
    (Some(1L), Some(10L), Some("click"), Some(5.0)),     // valid
    (Some(2L), None, Some("view"), Some(5.0)),           // null account
    (Some(3L), Some(10L), Some("error"), Some(5.0)),     // bad type
    (Some(4L), Some(10L), Some("click"), Some(0.0)),     // amount not > 0
    (Some(5L), Some(10L), Some("click"), Some(-2.0)),    // negative
    (Some(6L), Some(10L), None, Some(5.0)),              // null type
    (Some(7L), Some(10L), Some("purchase"), None)        // null amount
  ).toDF("event_id", "user_id", "event_type", "value")

  test("P4/P5 validity truth table") {
    val out = Validate.validityFlags(events)
      .select("event_id", "is_valid", "validation_status")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    assert(out === Seq(
      (1L, true, "valid"), (2L, false, "invalid"), (3L, false, "invalid"),
      (4L, false, "invalid"), (5L, false, "invalid"), (6L, false, "invalid"),
      (7L, false, "invalid")))
  }

  test("P7 error strings collected per violation") {
    val errs = Validate.validityFlags(events)
      .select("event_id", "validation_errors")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(errs(1L).isEmpty)
    assert(errs(2L) === "missing account_id")
    assert(errs(3L) === "invalid type: error")
    assert(errs(4L) === "invalid amount")
    assert(errs(7L) === "invalid amount")
  }

  test("P7 multiple violations joined with |") {
    val multi = Seq((Option.empty[Long], Option.empty[Long],
      Some("error"), Some(-1.0)))
      .toDF("event_id", "user_id", "event_type", "value")
    val r = Validate.validityFlags(multi).collect().head
    assert(r.getAs[String]("validation_errors") ===
      "missing transaction_id|missing account_id|invalid amount|invalid type: error")
    assert(r.getAs[Int]("n_errors") === 4)
  }

  test("A5 validation summary counts and rate") {
    val r = Validate.validationSummary(events).collect().head
    assert(r.getAs[Long]("n_total") === 7)
    assert(r.getAs[Long]("n_valid") === 1)
    assert(r.getAs[Long]("n_invalid") === 6)
    assert(math.abs(r.getAs[Double]("success_rate") - 1.0 / 7) < 1e-12)
  }

  test("A6 uniqueness violations") {
    val df = Seq(1, 1, 2, 3, 3, 3).toDF("k")
    val v = Validate.uniqueViolations(df, "k").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(v === Seq((1, 2), (3, 3)))
  }

  test("A7 range check boundaries inclusive") {
    val df = Seq(0.01, 1000000.0, 0.009, 1000000.01).toDF("amt")
    val r = Validate.rangeCheck(df, "amt", 0.01, 1000000.0).collect().head
    assert(r.getAs[Long]("n_violations") === 2)
  }

  test("A8 set membership ignores nulls (GE convention)") {
    val df = Seq(Some("O"), Some("X"), None, Some("X")).toDF("st")
    val v = Validate.setMembershipViolations(df, "st", Seq("O", "F")).collect()
    assert(v.length === 1 && v.head.getString(0) === "X" && v.head.getLong(1) === 2)
  }

  test("S8 dead letter branch = exactly the invalid rows") {
    val dead = Validate.deadLetter(events).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(dead === Seq(2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("schema profile: per-column completeness, cardinality, length range") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:15:00")
    val df = Seq(
      (1L, Some(10L), "click", Some(5.0), Some(ts), """{"k":1}"""),
      (2L, None, "view", Some(5.0), Some(ts), """{"k":22}"""),
      (3L, Some(10L), "click", None, None, """{"k":1}""")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val p = Validate.schemaProfile(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    assert(p.keySet === Set("event_id", "event_type", "props", "ts", "user_id", "value"))
    assert(p("event_id") === ((3L, 0L, 3L, 1L, 1L, 1.0)))
    assert(p("user_id") === ((3L, 1L, 1L, 2L, 2L, 2.0 / 3.0)))
    assert(p("event_type") === ((3L, 0L, 2L, 4L, 5L, 1.0)))
    // value renders canonically as decimal(18,2): "5.00", one distinct
    assert(p("value") === ((3L, 1L, 1L, 4L, 4L, 2.0 / 3.0)))
    assert(p("ts")._3 === 1L && p("ts")._2 === 1L)
    assert(p("props") === ((3L, 0L, 2L, 7L, 8L, 1.0)))
  }
}
