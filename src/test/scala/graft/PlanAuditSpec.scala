package graft

/** The plan audit as a regression GATE: a new operator whose physical
  * plan contains a CARTESIAN / BNLJ / UNPART_WINDOW shape that is not
  * an explicitly declared trade in [[PlanAudit.allowlist]] fails the
  * build — "explain everything before shipping" enforced by test. */
class PlanAuditSpec extends SparkSpec {

  test("every plan red flag is an allowlisted declared scale trade") {
    val results = PlanAudit.audit(spark, sf())
    val errors = results.collect {
      case (n, fs) if fs.exists(_.startsWith("ERROR")) => n -> fs
    }
    assert(errors.isEmpty, s"queries failed to plan: $errors")
    val bad = PlanAudit.violations(results)
    assert(bad.isEmpty,
      s"non-allowlisted plan flags (fix the shape or declare the trade " +
        s"in PlanAudit.allowlist next to its rationale): $bad")
  }

  test("allowlist names stay live: no stale entries for removed queries") {
    val known = SparkEntry.queries.keySet
    val stale = PlanAudit.allowlist.keySet -- known
    assert(stale.isEmpty, s"allowlist entries for queries that no longer exist: $stale")
  }
}
