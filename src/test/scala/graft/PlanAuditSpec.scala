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

  test("CORPUS_CACHE fires on token-grain caches and spares bounded/reduced ones") {
    // the q_known_item round-11 defect shape: a cached frame whose
    // subtree explodes corpus text to token grain with no fixed
    // budget — reconstructed as a minimal plan string so the gate's
    // semantics stay pinned even with zero live instances
    def plan(extra: String): String =
      s"""Sort [q ASC]
         |+- InMemoryTableScan [a]
         |      +- InMemoryRelation [a], StorageLevel(disk, memory)
         |            +- AdaptiveSparkPlan isFinalPlan=false
         |               +- Project [a]
         |$extra
         |                     +- Generate explode(split(lower(text#1),  , -1)), [doc_id#0L], false, [w#6]
         |                        +- FileScan parquet [doc_id#0L,text#1] Location: InMemoryFileIndex(1 paths)[file:/x/documents.parquet]
         |+- FileScan parquet [doc_id#9L] Location: InMemoryFileIndex(1 paths)[file:/x/documents.parquet]""".stripMargin
    val tokenGrain = plan("""                  +- Filter isnotnull(w#6)""")
    assert(PlanAudit.flagsOf(tokenGrain).contains("CORPUS_CACHE"),
      "unbounded token-grain cache must flag")
    // a TakeOrdered bound anywhere in the cached subtree exempts
    val budgeted = plan(
      """                  +- TakeOrderedAndProject(limit=200, orderBy=[doc_id ASC], output=[a])""")
    assert(!PlanAudit.flagsOf(budgeted).contains("CORPUS_CACHE"),
      "fixed-budget cache must not flag")
    // a topmost corpus-REDUCING aggregate fixes the grain (vocab-level
    // model tables: per-(source, word) counts)
    val reduced = plan(
      """                  +- HashAggregate(keys=[source#3, w#6], functions=[count(1)], output=[source#3, w#6, c#7L])""")
    assert(!PlanAudit.flagsOf(reduced).contains("CORPUS_CACHE"),
      "vocabulary-grain aggregate cache must not flag")
    // ...but an aggregate keyed by a corpus-grain row id does NOT
    val docGrain = plan(
      """                  +- HashAggregate(keys=[doc_id#0L, w#6], functions=[count(1)], output=[doc_id#0L, w#6, tf#8L])""")
    assert(PlanAudit.flagsOf(docGrain).contains("CORPUS_CACHE"),
      "doc_id-keyed aggregate cache must still flag")
    // a GLOBAL aggregate (keys=[]) is maximal reduction — a cached
    // single-row totals frame must not flag (round 13)
    val globalAgg = plan(
      """                  +- HashAggregate(keys=[], functions=[count(1)], output=[c#7L])""")
    assert(!PlanAudit.flagsOf(globalAgg).contains("CORPUS_CACHE"),
      "cached global-aggregate totals frame must not flag")
  }

  test("CORPUS_CACHE fires on non-token-grain corpus caches (decode frames)") {
    // VERDICT r12 task 4a: a mapPartitions decode frame cached at
    // document grain — no Generate anywhere — is still a corpus-scale
    // cache; the round-12 gate could not see it
    val decodeFrame =
      """Sort [vec_id ASC]
        |+- InMemoryTableScan [vec_id, embedding]
        |      +- InMemoryRelation [vec_id, embedding], StorageLevel(disk, memory)
        |            +- SerializeFromObject
        |               +- MapPartitions graft.llm.Multimodal$$Lambda, obj#12
        |                  +- DeserializeToObject
        |                     +- FileScan parquet [doc_id#0L] Location: InMemoryFileIndex(1 paths)[file:/x/documents.parquet]""".stripMargin
    assert(PlanAudit.flagsOf(decodeFrame).contains("CORPUS_CACHE"),
      "unbounded mapPartitions decode-frame cache must flag")
    // the same frame behind a limit is probe-bounded
    val bounded = decodeFrame.replace(
      "+- SerializeFromObject",
      "+- GlobalLimit 64\n               +- SerializeFromObject")
    assert(!PlanAudit.flagsOf(bounded).contains("CORPUS_CACHE"),
      "limit-bounded decode-frame cache must not flag")
  }

  test("corpus-cache subtree walk descends past ':-' join children (ADVICE r12)") {
    // a bounding TakeOrdered sitting under the LEFT (':-') child of a
    // join inside the cached plan: the round-12 walk truncated at the
    // first ':-' line and mis-flagged this as unbounded
    val joinInCache =
      """Sort [q ASC]
        |+- InMemoryRelation [a], StorageLevel(disk, memory)
        |      +- BroadcastHashJoin [doc_id#0L], [doc_id#9L], Inner
        |         :- TakeOrderedAndProject(limit=200, orderBy=[doc_id ASC], output=[a])
        |         :  +- FileScan parquet [doc_id#0L,text#1] Location: InMemoryFileIndex(1 paths)[file:/x/documents.parquet]
        |         +- BroadcastExchange
        |            +- FileScan parquet [doc_id#9L] Location: InMemoryFileIndex(1 paths)[file:/x/nation.parquet]""".stripMargin
    assert(!PlanAudit.flagsOf(joinInCache).contains("CORPUS_CACHE"),
      "a bound under a ':-' join child must exempt the cache")
  }

  test("WINSPEC_PARSE fails loud on a Window line no print form parses") {
    // VERDICT r12 task 4b: the round-11 'documented false negative'
    // (a bracketed partition expression defeats the regex) must now
    // raise a flag instead of silently passing the LOWCARD gate
    val bracketed =
      """Project [a]
        |+- Window [sum(x#1L) windowspecdefinition(v#2[0], specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS s#3L], [v#2[0]], [x#1L ASC NULLS FIRST]
        |   +- FileScan parquet [v#2] Location: InMemoryFileIndex(1 paths)[file:/x/documents.parquet]""".stripMargin
    assert(PlanAudit.flagsOf(bracketed).contains("WINSPEC_PARSE"),
      "unparseable window spec must fail loud")
    // ...and the live suite has zero unparsed window lines: both
    // two-group print forms (partition-only; order-only) now parse
    val unparsed = results.collect {
      case (n, fs) if fs.contains("WINSPEC_PARSE") => n
    }
    assert(unparsed.isEmpty, s"WINSPEC_PARSE fired on live queries: $unparsed")
  }

  test("an order-only (global) window flags UNPART unless limit-bounded") {
    def plan(input: String): String =
      s"""Project [a]
         |+- Window [row_number() windowspecdefinition(s#1 DESC NULLS LAST, specifiedwindowframe(RowFrame, unboundedpreceding$$(), currentrow$$())) AS rn#2], [s#1 DESC NULLS LAST]
         |$input
         |      +- FileScan parquet [s#1] Location: InMemoryFileIndex(1 paths)[file:/x/documents.parquet]""".stripMargin
    // over the raw corpus: a single-partition sort of everything
    assert(PlanAudit.flagsOf(plan("   +- Sort [s#1 DESC NULLS LAST], false, 0"))
      .contains("UNPART_WINDOW"),
      "global window over unbounded input must flag")
    // over a top-N frame: constant-sized by construction (q_rrf_rank)
    assert(!PlanAudit.flagsOf(
      plan("   +- TakeOrderedAndProject(limit=200, orderBy=[s#1 DESC], output=[s#1])"))
      .contains("UNPART_WINDOW"),
      "global window over a TakeOrdered top-N frame must not flag")
  }

  test("allowlist names stay live: no stale entries for removed queries") {
    val known = SparkEntry.queries.keySet
    val stale = PlanAudit.allowlist.keySet -- known
    assert(stale.isEmpty, s"allowlist entries for queries that no longer exist: $stale")
  }
}
