package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Aggregate, Enrich, Generator, Ingest, Lineage, Temporal, Windows}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("SCD2 intervals chain per user; exactly one open current row") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, 1.0),
      (2L, ts("2024-01-02 10:00:00"), 7L, 2.0),
      (3L, ts("2024-01-03 10:00:00"), 7L, 3.0),
      (4L, ts("2024-01-05 09:00:00"), 9L, 4.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Temporal.scd2Snapshot(df).collect()
    val u7 = out.filter(_.getLong(0) == 7L)
    // each interval's valid_to is the next row's valid_from
    assert(u7.map(_.getTimestamp(3)).toSeq ===
      Seq(ts("2024-01-01 10:00:00"), ts("2024-01-02 10:00:00"), ts("2024-01-03 10:00:00")))
    assert(u7.init.map(r => r.getTimestamp(4)).toSeq === u7.tail.map(_.getTimestamp(3)).toSeq)
    assert(out.count(_.getBoolean(5)) === 2) // one current row per user
  }

  test("gap fill densifies missing days with zero counts") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, 1.0),
      (2L, ts("2024-01-04 10:00:00"), 7L, 1.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Temporal.gapFillDaily(df).collect()
      .map(r => (r.getDate(1).toString, r.getBoolean(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("2024-01-01", true, 1L), ("2024-01-02", false, 0L),
      ("2024-01-03", false, 0L), ("2024-01-04", true, 1L)))
  }

  test("funnel: converts only on purchase at/after first click") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 7L, "purchase", 5.0), // converts
      (3L, ts("2024-01-02 10:00:00"), 9L, "purchase", 5.0), // before the click
      (4L, ts("2024-01-03 10:00:00"), 9L, "click", 1.0),
      (5L, ts("2024-01-01 10:00:00"), 11L, "view", 1.0) // no click: excluded
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Temporal.funnel(df).collect()
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(2)), r.getBoolean(3)))).toMap
    assert(out.keySet === Set(7L, 9L))
    assert(out(7L) === ((Some(ts("2024-01-01 11:00:00")), true)))
    assert(out(9L) === ((None, false)))
  }

  test("A2 window agg equals ungrouped totals per (window, user)") {
    val ev = Tables.events(spark, sf())
    val agg = Aggregate.hourlyUserAgg(ev)
    val total = agg.agg(sum("n_events")).collect().head.getLong(0)
    assert(total === ev.count())
  }

  test("A3 sliding window assigns each event to exactly 2 windows") {
    val ev = Tables.events(spark, sf())
    val agg = Aggregate.slidingWindowAgg(ev)
    assert(agg.agg(sum("n_events")).collect().head.getLong(0) === 2 * ev.count())
  }

  test("moneySum is exact and order-independent") {
    val df = (1 to 1000).map(i => i * 0.01).toDF("v")
    val a = df.repartition(7).agg(Aggregate.moneySum(col("v"))).collect().head.getDouble(0)
    val b = df.repartition(1).agg(Aggregate.moneySum(col("v"))).collect().head.getDouble(0)
    assert(a === b)
    assert(a === 5005.0)
  }

  test("P6 categorize passthrough for non-matching types") {
    val df = Seq((1L, "error", 9999.0)).toDF("event_id", "event_type", "value")
    assert(Enrich.categorize(df).collect().head.getString(3) === "error")
  }

  test("salted join equals plain join and spreads a hot key over salts") {
    val fact = Seq.tabulate(100)(i => (1L, i.toLong)) // one hot key
      .toDF("k", "row_id")
    val dim = Seq((1L, "hot"), (2L, "cold")).toDF("k", "label")
    val salted = Enrich.saltedJoin(fact, dim, "k", 4, "row_id")
    val plain = fact.join(dim, "k")
    assert(salted.count() === plain.count())
    assert(salted.select("label").distinct().collect().map(_.getString(0)).toSeq === Seq("hot"))
    // the hot key's rows really do carry more than one salt value
    val saltCount = fact.withColumn("salt",
      pmod(hash(col("row_id")), lit(4))).select("salt").distinct().count()
    assert(saltCount > 1)
  }

  test("dim enrich joins the full star without row loss") {
    val out = Enrich.dimEnrich(Tables.customer(spark, sf()),
      Tables.nation(spark, sf()), Tables.region(spark, sf()))
    assert(out.count() === Tables.customer(spark, sf()).count())
    assert(out.filter(col("nation").isNull || col("region").isNull).count() === 0)
  }

  test("anti + semi partition orders exactly") {
    val orders = Tables.orders(spark, sf())
    val li = Tables.lineitem(spark, sf())
    val anti = Enrich.reconcileAnti(orders, li).count()
    val semi = orders.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    assert(anti + semi === orders.count())
  }

  test("P2 json decode extracts k as int") {
    val df = Seq((1L, "click", """{"k": 42}"""), (2L, "view", """{"k": 0}"""))
      .toDF("event_id", "event_type", "props")
    val out = Ingest.jsonDecode(df).collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out === Map(1L -> 42, 2L -> 0))
  }

  test("variant field agg: schema-on-read extraction, malformed -> NULL") {
    val df = Seq(
      (1L, "click", """{"k": 42}"""),
      (2L, "click", """{"k": 42}"""),
      (3L, "click", """{"k": 7, "extra": {"nested": true}}"""), // evolving schema
      (4L, "view", """not json at all"""),                     // malformed
      (5L, "view", """{"other": 1}"""),                        // field missing
      (6L, "view", """{"k": "abc"}"""))                        // non-castable k
      .toDF("event_id", "event_type", "props")
    val out = Ingest.variantFieldAgg(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))).toMap
    // click: 3 events, sum 91, distinct {42, 7}
    assert(out("click") === ((3L, 91L, 2L)))
    // view: all three rows yield NULL k (malformed parse / missing
    // field / non-castable value — the last needs try_variant_get, not
    // just try_parse_json): counted as events, excluded from sum and
    // distinct, and none of them fails the job
    assert(out("view") === ((3L, -1L, 0L)))
  }

  test("S2/S4 kafka round-trip preserves fields") {
    val df = Seq((7L, "click", 1.5)).toDF("user_id", "event_type", "value")
    val shaped = Ingest.kafkaShaped(df)
    val schema = df.schema
    val back = Ingest.kafkaParse(shaped, schema)
    val r = back.collect().head
    assert(r.getAs[String]("key") === "7")
    assert(r.getAs[Long]("user_id") === 7L)
    assert(r.getAs[String]("event_type") === "click")
    assert(r.getAs[Double]("value") === 1.5)
  }

  test("lineage hash is stable and 64 hex chars") {
    val df = Seq((1L, 2L, "click", """{"k":1}""")).toDF("event_id", "user_id", "event_type", "props")
    val h1 = Lineage.recordHashes(df).collect().head.getString(2)
    val h2 = Lineage.recordHashes(df).collect().head.getString(2)
    assert(h1 === h2 && h1.matches("[0-9a-f]{64}"))
  }

  test("lineage read-back ordered by processing time, not stage name") {
    val ev = Seq(
      (1L, 2L, "click", "{}", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (9L, 2L, "view", "{}", java.sql.Timestamp.valueOf("2024-01-01 11:00:00")))
      .toDF("event_id", "user_id", "event_type", "props", "ts")
    val out = Lineage.lineageReadback(ev, 1L).collect()
    val steps = out.map(_.getAs[String]("processing_stage")).toSeq
    // processing order — alphabetical would give enrich,receive,validate
    assert(steps === Seq("receive", "validate", "enrich"))
    assert(out.map(_.getAs[Long]("transaction_id")).distinct.toSeq === Seq(1L))
    val r = out.head
    assert(r.getAs[String]("lineage_id").matches("[0-9a-f]{64}"))
    assert(r.getAs[String]("output_record_hash") !==
      r.getAs[String]("input_record_hash"))
    assert(r.getAs[String]("status") === "success")
    assert(r.getAs[String]("metadata") === """{"stage":"receive","seq":1}""")
  }

  test("session agg: gaps up to the timeout merge, beyond it split") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 5L, 1.0),
      (2L, t("2024-01-01 10:29:59"), 5L, 2.0),  // gap < 30min → same session
      (3L, t("2024-01-01 10:59:59"), 5L, 4.0),  // chained (< 30min from #2)
      (4L, t("2024-01-01 11:29:59"), 7L, 8.0),
      (5L, t("2024-01-01 11:59:59"), 7L, 16.0), // exactly 30min → still merges
      (6L, t("2024-01-01 12:30:00"), 7L, 32.0)) // 30min 1s → new session
      .toDF("event_id", "ts", "user_id", "value")
    val out = Aggregate.sessionAgg(ev).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((5L, 3L, 7.0), (7L, 2L, 24.0), (7L, 1L, 32.0)))
  }

  test("as-of join: latest click at-or-before each purchase, null when none") {
    import graft.pipeline.Asof
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 09:00:00"), 5L, "click", 1.0),
      (2L, t("2024-01-01 10:00:00"), 5L, "click", 2.0),
      (3L, t("2024-01-01 10:00:00"), 5L, "purchase", 9.0),  // tie → click 2 counts (<=)
      (4L, t("2024-01-01 11:00:00"), 5L, "purchase", 8.0),  // latest prior click = 2
      (5L, t("2024-01-01 08:00:00"), 6L, "purchase", 7.0))  // user 6 has no click → nulls
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Asof.lastClickBeforePurchase(ev).collect()
      .map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Long])).toMap
    assert(out === Map(3L -> Some(2L), 4L -> Some(2L), 5L -> None))
  }

  test("range join: same-user events in the hour after each purchase") {
    import graft.pipeline.Asof
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:30:00"), 5L, "purchase", 9.0),
      (2L, t("2024-01-01 10:45:00"), 5L, "click", 1.0),    // within (10:30, 11:30]
      (3L, t("2024-01-01 11:30:00"), 5L, "view", 2.0),     // boundary: included (<=)
      (4L, t("2024-01-01 11:30:01"), 5L, "click", 4.0),    // outside
      (5L, t("2024-01-01 10:30:00"), 5L, "click", 8.0),    // same instant: excluded (>)
      (6L, t("2024-01-01 10:40:00"), 6L, "click", 1.0),    // other user
      (7L, t("2024-01-01 23:00:00"), 7L, "purchase", 1.0)) // no followers
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Asof.eventsWithinHourAfterPurchase(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out === Map(1L -> ((2L, 3.0)), 7L -> ((0L, 0.0))))
  }

  test("pivot: per-type monthly counts with zeros for absent types") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-05 00:00:00"), "click"),
      (2L, t("2024-01-06 00:00:00"), "click"),
      (3L, t("2024-02-01 00:00:00"), "view"))
      .toDF("event_id", "ts", "event_type")
    val rows = Windows.monthlyTypePivot(ev).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows((2024, 1)) === ((2L, 0L))) // 2 clicks, 0 views
    assert(rows((2024, 2)) === ((0L, 1L)))
  }

  test("value profile: exact percentiles and stabilized mean") {
    val ev = Seq(
      (1L, "click", 1.0), (2L, "click", 2.0), (3L, "click", 3.0), (4L, "click", 4.0))
      .toDF("event_id", "event_type", "value")
    val r = Windows.valueProfile(ev).collect().head
    assert(r.getAs[Double]("p50") === 2.5)   // interpolated median of 1..4
    assert(math.abs(r.getAs[Double]("p95") - 3.85) < 1e-12) // 1 + 0.95*3 interpolation
    assert(r.getAs[Double]("avg_v") === 2.5)
    assert(r.getAs[Double]("min_v") === 1.0 && r.getAs[Double]("max_v") === 4.0)
  }

  test("window functions: latest-per-user picks max ts with tiebreak") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5L, "a", 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 5L, "b", 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 5L, "c", 3.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Windows.latestPerUser(df).collect().head
    assert(r.getAs[Long]("event_id") === 3L) // same ts → higher event_id wins
  }

  test("running sum accumulates in event order") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5L, "a", 1.5),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 5L, "a", 2.5)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Windows.runningSumPerUser(df).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("running_value")).toMap
    assert(out === Map(1L -> 1.5, 2L -> 4.0))
  }

  test("G1 generator: deterministic, per-type amount ranges hold") {
    val t1 = Generator.transactions(spark, 500)
    val t2 = Generator.transactions(spark, 500)
    assert(t1.collect().map(_.toString).sorted.toSeq === t2.collect().map(_.toString).sorted.toSeq)
    val ranges = Map(
      "deposit" -> (50.0, 5000.0), "withdrawal" -> (20.0, 1000.0),
      "transfer" -> (10.0, 3000.0), "payment" -> (5.0, 500.0), "refund" -> (5.0, 200.0))
    t1.select("transaction_type", "amount").collect().foreach { r =>
      val (lo, hi) = ranges(r.getString(0))
      assert(r.getDouble(1) >= lo && r.getDouble(1) <= hi,
        s"${r.getString(0)} amount ${r.getDouble(1)} out of [$lo,$hi]")
    }
    // merchant_info only for payments
    val m = t1.filter(col("merchant_info").isNotNull)
      .select("transaction_type").distinct().collect().map(_.getString(0)).toSeq
    assert(m === Seq("payment"))
  }

  test("G1 status skew: completed is the most frequent status") {
    val counts = Generator.transactions(spark, 2000)
      .groupBy("status").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("completed") > counts.filter(_._1 != "completed").values.max)
    // the producer's 4-slot draw only ever emits pending/completed
    assert(counts.keySet === Set("pending", "completed"))
  }

  test("G1 field parity: USD currency, empty tags/metadata, 5-digit merchant ids") {
    val t = Generator.transactions(spark, 500)
    assert(t.select("currency").distinct().collect().map(_.getString(0)).toSeq === Seq("USD"))
    val r = t.select("tags", "metadata").collect().head
    assert(r.getSeq[String](0).isEmpty && r.getMap[String, String](1).isEmpty)
    assert(!r.isNullAt(0) && !r.isNullAt(1))
    val mids = Generator.transactions(spark, 500)
      .filter(col("merchant_info").isNotNull)
      .select(element_at(col("merchant_info"), "merchant_id"))
      .collect().map(_.getString(0))
    assert(mids.nonEmpty && mids.forall(_.matches("M[1-9]\\d{4}")))
  }
}

class CoverageSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("P10 dot-path config getter") {
    val conf: graft.util.Conf.Nested = Map(
      "spark" -> Map("streaming" -> Map("batch_interval" -> 10), "master" -> "local"))
    assert(graft.util.Conf.get(conf, "spark.streaming.batch_interval") === 10)
    assert(graft.util.Conf.get(conf, "spark.master") === "local")
    assert(graft.util.Conf.get(conf, "spark.missing.path", "dflt") === "dflt")
    assert(graft.util.Conf.get(conf, "spark.master.too.deep", -1) === -1)
  }

  test("A10 parse check: all order dates parseable") {
    val r = graft.pipeline.Validate.parseCheck(Tables.orders(spark, sf()), "o_orderdate")
      .collect().head
    assert(r.getAs[Long]("n_unparseable") === 0L)
  }

  test("cube emits all four grouping margins") {
    val out = graft.pipeline.Windows.statusPriorityCube(Tables.orders(spark, sf()))
    val rows = out.collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n_orders") === Tables.orders(spark, sf()).count())
    assert(rows.exists(r => !r.isNullAt(0) && r.isNullAt(1)))  // status margin
    assert(rows.exists(r => r.isNullAt(0) && !r.isNullAt(1)))  // priority margin
  }

  test("rolling stats: bounded 4-row frame, growing head frames") {
    import spark.implicits._
    val df = List.tabulate(6) { j =>
      val i = j + 1
      (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-01 10:0$i:00"), 5L, i.toDouble)
    }.toDF("event_id", "ts", "user_id", "value")
    val out = graft.pipeline.Windows.rollingStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4), r.getDouble(6)))).toMap
    assert(out(1L) === ((1L, 1.0, 1.0)))
    assert(out(4L) === ((4L, 10.0, 4.0)))       // full frame 1..4
    assert(out(6L) === ((4L, 3.0 + 4 + 5 + 6, 6.0))) // sliding: 3..6
  }

  test("volume anomaly flags a 3x spike only after a full trailing week") {
    import spark.implicits._
    // days 1-8: 10 events/day; day 9: 30 events (3x the trailing avg)
    val rows = for {
      d <- 1 to 9
      i <- 1 to (if (d == 9) 30 else 10)
    } yield (d * 1000L + i,
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), 1L, 1.0)
    val df = rows.toDF("event_id", "ts", "user_id", "value")
    val out = Windows.volumeAnomaly(df).collect()
    assert(out.length === 9)
    val day9 = out.last
    assert(day9.getAs[Boolean]("anomaly"))
    assert(day9.getAs[Double]("trailing_avg") === 10.0)
    assert(day9.getAs[Double]("ratio") === 3.0)
    assert(out.init.forall(!_.getAs[Boolean]("anomaly"))) // steady days clean
    assert(out.head.getAs[Double]("trailing_avg") === -1.0) // no history sentinel
  }

  test("approx quantiles sketch lands within the tolerance band") {
    val ev = Tables.events(spark, sf())
    val rows = graft.pipeline.Windows.approxQuantiles(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_within_tol"), s"${r.getString(0)} out of tolerance")
      assert(r.getAs[Double]("p95") >= r.getAs[Double]("p50"))
    }
  }

  test("approx distinct within 10% of exact") {
    val ev = Tables.events(spark, sf())
    val approx = graft.pipeline.Windows.approxDistinctUsers(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.pipeline.Windows.distinctUsers(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.1, s"$k: approx=${approx(k)} exact=$e")
    }
  }

  import spark.implicits._

  test("percent_rank: min is 0, max is 1, single tie order by key") {
    val df = Seq((1L, "O", 10.0), (2L, "O", 20.0), (3L, "O", 30.0),
      (4L, "F", 5.0)).toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val out = Windows.statusPercentRank(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) === 0.0 && out(2L) === 0.5 && out(3L) === 1.0)
    assert(out(4L) === 0.0) // single-row group
  }

  test("event paths: ordered per user, truncated, counted") {
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, 1L, "click", 1.0, t("2024-01-01 00:00:01"), "{}"),
      (2L, 1L, "purchase", 1.0, t("2024-01-01 00:00:02"), "{}"),
      (3L, 2L, "click", 1.0, t("2024-01-01 00:00:01"), "{}"),
      (4L, 2L, "purchase", 1.0, t("2024-01-01 00:00:02"), "{}"),
      (5L, 3L, "view", 1.0, t("2024-01-01 00:00:01"), "{}")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Windows.topEventPaths(df).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out === Seq((1, "click>purchase", 2L), (2, "view", 1L)))
  }

  test("zscore: mean 0, symmetric pair gets +/- same magnitude") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq(
      (1L, 1L, "click", 10.0, t, "{}"), (2L, 1L, "click", 20.0, t, "{}"),
      (3L, 1L, "click", 30.0, t, "{}")
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Windows.zscoreByType(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(1L) + out(3L)) < 1e-12 && out(3L) > 0)
  }

  test("zorder key interleaves bits (x=3,y=1 -> 7; x=0,y=2 -> 8)") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq(
      (1L, 3L, "click", 0.01, t, "{}"),  // x=3, y=1 cent
      (2L, 0L, "click", 0.02, t, "{}")   // x=0, y=2 cents
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Windows.zorderKey(df).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // x=3 (bits 0,1 set) -> even positions 0,2 = 1+4; y=1 -> odd position 1 = 2
    assert(out(1L) === 7L)
    // y=2 (bit 1) -> odd position 3 = 8
    assert(out(2L) === 8L)
  }

  test("cohort retention: offsets count distinct active users per week") {
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, 1L, "click", 1.0, t("2024-01-01 10:00:00"), "{}"), // cohort wk of Jan 1 (Mon)
      (2L, 1L, "view", 1.0, t("2024-01-02 10:00:00"), "{}"),  // same week, same user
      (3L, 1L, "click", 1.0, t("2024-01-08 10:00:00"), "{}"), // next week
      (4L, 2L, "click", 1.0, t("2024-01-08 10:00:00"), "{}")  // new cohort wk2
    ).toDF("event_id", "user_id", "event_type", "value", "ts", "props")
    val out = Temporal.cohortRetention(df).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(out === Seq(("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L),
      ("2024-01-08", 0, 1L)))
  }

  test("incremental summary merge equals full recompute") {
    val ev = Tables.events(spark, sf())
    val merged = Temporal.incrementalDailySummary(ev).collect()
    val full = ev
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(col("value")).as("n"),
        Aggregate.moneySum(col("value")).as("sv"))
      .orderBy("event_type", "day").collect()
    assert(merged.length === full.length)
    merged.zip(full).foreach { case (m, f) =>
      assert(m.getString(0) === f.getString(0) && m.getDate(1) === f.getDate(1))
      assert(m.getLong(2) === f.getLong(2))
      assert(m.getDouble(3) === f.getDouble(3))
    }
  }

  test("group sample: exactly k per stratum, deterministic across runs") {
    val docs = (0L until 40L).map(i =>
      (i, s"text $i", if (i % 2 == 0) "en" else "fr", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = graft.llm.Curate.groupSample(docs, 3).collect().map(_.toSeq).toSeq
    val b = graft.llm.Curate.groupSample(docs.repartition(7), 3).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.count(_.head == "en") === 3 && a.count(_.head == "fr") === 3)
  }

  test("pricing summary: all-decimal money algebra, shipdate fence inclusive") {
    import java.sql.Timestamp
    val li = Seq(
      // flag, status, qty, extprice, disc, tax, shipdate
      ("A", "F", 10.0, 100.0, 0.10, 0.05, Timestamp.valueOf("1998-09-02 00:00:00")),
      ("A", "F", 20.0, 200.0, 0.00, 0.10, Timestamp.valueOf("1998-01-01 00:00:00")),
      ("N", "O", 5.0, 50.0, 0.50, 0.00, Timestamp.valueOf("1997-06-15 00:00:00")),
      ("A", "F", 99.0, 999.0, 0.99, 0.99, Timestamp.valueOf("1998-09-03 00:00:00")) // fenced out
    ).toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "l_shipdate")
    val out = graft.pipeline.Enrich.pricingSummary(li).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(9))).toMap
    // AF: qty 30, base 300, disc_price 100*0.9 + 200*1.0 = 290,
    //     charge 90*1.05 + 200*1.10 = 94.5 + 220 = 314.5; 2 rows kept
    assert(out(("A", "F")) === ((30.0, 300.0, 290.0, 314.5, 2L)))
    assert(out(("N", "O")) === ((5.0, 50.0, 25.0, 25.0, 1L)))
    assert(out.size === 2)
  }

  test("brand revenue broadcasts the part dimension") {
    val plan = graft.pipeline.Enrich.brandRevenue(
        Tables.lineitem(spark, sf()), Tables.part(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("SortMergeJoin"))
  }

  // ---- NULL-semantics pins: the pinned testdata has zero NULLs, so the
  // DuckDB oracle is structurally blind to these divergences — each is
  // pinned here against hand-built frames instead.

  test("asof join: NULL keys never match (ASOF LEFT JOIN semantics)") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // NULL-user click + NULL-user purchase: must NOT pair up
      (1L, Option(ts("2024-01-01 09:00:00")), None: Option[Long], "click", 1.0),
      (2L, Option(ts("2024-01-01 10:00:00")), None: Option[Long], "purchase", 5.0),
      // normal pair
      (3L, Option(ts("2024-01-01 09:30:00")), Option(7L), "click", 1.0),
      (4L, Option(ts("2024-01-01 10:30:00")), Option(7L), "purchase", 5.0),
      // NULL-ts click can never satisfy p.ts >= c.ts
      (5L, None: Option[java.sql.Timestamp], Option(8L), "click", 1.0),
      (6L, Option(ts("2024-01-01 11:00:00")), Option(8L), "purchase", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.pipeline.Asof.lastClickBeforePurchase(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap
    assert(out(2L) === None, "NULL-user purchase must keep NULL click columns")
    assert(out(4L) === Some(3L))
    assert(out(6L) === None, "NULL-ts click must never be matched")
  }

  test("record hash is injective across NULLs, delimiters, and the sentinel") {
    val rows = Seq(
      // null-vs-value swap across adjacent fields (concat_ws alone collides)
      (1L, None: Option[Long], Option("7"), Option("p")),
      (1L, Option(7L), None: Option[String], Option("p")),
      // delimiter shift between fields (boundary forgery)
      (1L, Option(7L), Option("a|b"), Option("c")),
      (1L, Option(7L), Option("a"), Option("b|c")),
      // literal "\N" field vs actual NULL (sentinel forgery)
      (1L, Option(7L), Option("\\N"), Option("p")),
      (1L, Option(7L), None: Option[String], Option("p2"))
    ).toDF("event_id", "user_id", "event_type", "props")
    val hashes = Lineage.recordHashes(rows).collect().map(_.getString(2))
    assert(hashes.distinct.length === hashes.length,
      s"canonicalization collided: ${hashes.mkString(",")}")
  }

  test("scd2 orders NULL valid_from last in both the lead chain and output") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, Option(ts("2024-01-01 10:00:00")), 7L, 1.0),
      (2L, None: Option[java.sql.Timestamp], 7L, 2.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Temporal.scd2Snapshot(df).collect()
    // NULLS LAST (the DuckDB default): the dated row sorts first and its
    // lead() sees the NULL valid_from — with Spark's NULLS FIRST default
    // the rows would swap and event 2 would get valid_to = event 1's ts.
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(out.forall(_.isNullAt(4)), "no row may inherit a real valid_to")
    assert(out.forall(_.getBoolean(5)))
  }

  test("windowed aggregates exclude NULL-ts rows like their SQL twins") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, Option(ts("2024-01-01 10:05:00")), 7L, 1.0),
      (2L, None: Option[java.sql.Timestamp], 7L, 2.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val hourly = Aggregate.hourlyUserAgg(df).collect()
    assert(hourly.length === 1 && hourly.head.getLong(2) === 1L)
    val sess = Aggregate.sessionAgg(df).collect()
    assert(sess.length === 1 && sess.head.getLong(2) === 1L)
  }
}
