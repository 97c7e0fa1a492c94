package graft

/** The plan audit as a regression GATE: a new operator whose physical
  * plan contains a CARTESIAN / BNLJ / UNPART_WINDOW shape that is not
  * an explicitly declared trade in [[PlanAudit.allowlist]] fails the
  * build — "explain everything before shipping" enforced by test. */
class PlanAuditSpec extends SparkSpec {

  private lazy val results = PlanAudit.audit(spark, sf())

  test("every plan red flag is an allowlisted declared scale trade") {
    val errors = results.collect {
      case (n, fs) if fs.exists(_.startsWith("ERROR")) => n -> fs
    }
    assert(errors.isEmpty, s"queries failed to plan: $errors")
    val bad = PlanAudit.violations(results)
    assert(bad.isEmpty,
      s"non-allowlisted plan flags (fix the shape or declare the trade " +
        s"in PlanAudit.allowlist next to its rationale): $bad")
  }

  test("LOWCARD_WINDOW fires on exactly the declared allowlisted instances") {
    // the hidden-unbounded-partition heuristic (VERDICT r10 task 6)
    // names q_pack_sequences — the defect class round 10 found by
    // hand — plus q_gini_sources, whose full per-source rank-sum is
    // the exact-Gini DEFINITION (declared exact-statistic class).
    // Every other window is either keyed on an unbounded-domain
    // column or runs over an already-reduced aggregate frame. The
    // rule's first real catch, q_group_sample, was FIXED instead of
    // declared (bounded-heap top_k_by, the domainCap shape).
    val hits = results.collect {
      case (n, fs) if fs.contains("LOWCARD_WINDOW") => n
    }
    assert(hits == Seq("q_gini_sources", "q_pack_sequences"),
      s"LOWCARD_WINDOW fired on: $hits")
  }

  test("allowlist names stay live: no stale entries for removed queries") {
    val known = SparkEntry.queries.keySet
    val stale = PlanAudit.allowlist.keySet -- known
    assert(stale.isEmpty, s"allowlist entries for queries that no longer exist: $stale")
  }
}
