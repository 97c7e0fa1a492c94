package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment stages — dimension joins, categorization, multi-source
  * union, reconciliation.
  *
  * Reference semantics:
  *  - P6 nested CASE categorization with type×amount thresholds
  *    (`src/spark/transaction_processor.py:256-265`)
  *  - P8 account/customer dimension enrichment — stubbed in the
  *    reference ("you'd join with account and customer data here",
  *    `transaction_processor.py:267`) — realized here as broadcast
  *    hash joins over the customer→nation→region star.
  *  - Multi-source ingestion (`src/config/kafka_config.yml:16-19`,
  *    `README.md:12`) → union-by-name of normalized sources.
  *  - Reconciliation / discrepancy resolution (`README.md:3,102`) →
  *    anti/semi joins between sources.
  *
  * Scale: dimension tables (nation=25, region=5, customer ≪ fact) are
  * broadcast — zero shuffle on the fact side; the plan keeps the fact
  * table's partitioning intact. Anti/semi joins shuffle once on the
  * join key; at 100 TB they benefit from AQE skew handling which the
  * session enables.
  */
object Enrich {

  /** Exactness-critical discounted-price product: extprice·(1−disc)
    * entirely in DECIMAL(18,2) BEFORE any sum, so partial-aggregation
    * order cannot perturb a bit (see Aggregate.moneySum). Single
    * definition for every revenue query — a precision change here
    * cannot silently split the queries. */
  private[pipeline] def discountedPrice(extPrice: Column, discount: Column): Column =
    extPrice.cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - discount.cast("decimal(18,2)"))

  /** SQL string-literal escaping for parameterized oracle generators:
    * a segment like O'BRIEN must not truncate the predicate. */
  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Validated DATE literal — fail loudly on a non-date parameter
    * instead of emitting malformed oracle SQL. */
  private def sqlDate(s: String): String = {
    require(s.matches("""\d{4}-\d{2}-\d{2}"""), s"not a yyyy-MM-dd date: $s")
    s"DATE '$s'"
  }

  /** P6: nested CASE categorization, preserving the reference's
    * structure exactly (`transaction_processor.py:256-265`): per-type
    * threshold branches emit "large_" / "regular_" labels; types
    * outside the threshold map pass through unchanged. */
  def categorize(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("event_type"), col("value"),
      when(col("event_type") === "purchase",
        when(col("value") > 1000, "large_purchase").otherwise("regular_purchase"))
        .when(col("event_type") === "signup",
          when(col("value") > 500, "large_signup").otherwise("regular_signup"))
        .when(col("event_type") === "view",
          when(col("value") > 100, "long_view").otherwise("regular_view"))
        .otherwise(col("event_type")).as("category"))
      .orderBy("event_id")

  /** P8: broadcast dimension enrichment across the star schema. */
  def dimEnrich(customer: DataFrame, nation: DataFrame,
                region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name").as("nation"), col("r_name").as("region"))
      .orderBy("c_custkey")

  /** Multi-source union: normalize two sources to one schema and union. */
  def multiSourceUnion(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val a = orders.select(
      col("o_orderkey").as("id"), lit(0).as("line"),
      lit("orders").as("src"), col("o_totalprice").as("amount"))
    val b = lineitem.select(
      col("l_orderkey").as("id"), col("l_linenumber").as("line"),
      lit("lineitem").as("src"), col("l_extendedprice").as("amount"))
    a.unionByName(b).orderBy("src", "id", "line")
  }

  /** Reconciliation: orders with no lineitems — the discrepancy set
    * between two sources (anti join). */
  def reconcileAnti(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(lineitem, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")

  /** Matched-rows check: customers that DO have orders (semi). */
  def reconcileSemi(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Skew-salted join: when one join key dominates (a hot account, a
    * viral document), AQE's skew splitting handles most cases, but the
    * deterministic fallback is salting — the fact side spreads each
    * key over `salts` shuffle partitions via a hash-derived salt (no
    * randomness: same row → same salt on any cluster), and the small
    * side is replicated once per salt value. Join key becomes
    * (key, salt) — a hot key's rows land on `salts` reducers instead
    * of one. Result is row-identical to the unsalted join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, saltSource: String): DataFrame = {
    val salted = fact.withColumn("salt",
      pmod(hash(col(saltSource)), lit(salts)))
    val replicated = dim.withColumn("salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "salt")).drop("salt")
  }

  /** Skew-proof enrichment: the events fact joined to the customer dim
    * through [[saltedJoin]] (8 salts), then aggregated per nation. The
    * salt spreads any hot user_id across 8 shuffle partitions — the
    * manual defense for the skewed-key join AQE can't always split
    * (e.g. a single mega-key inside one group). Result is oracle-equal
    * to the plain join: salting must never change semantics. */
  def saltedUserEnrich(events: DataFrame, customer: DataFrame,
                       salts: Int = 8): DataFrame = {
    val dim = customer.select(col("c_custkey").as("user_id"), col("c_nationkey"))
    saltedJoin(events.filter(col("user_id").isNotNull), dim,
        "user_id", salts, "event_id")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_events"),
        Aggregate.moneySum(col("value")).as("sum_value"))
      .orderBy("c_nationkey")
  }

  val sqlSaltedUserEnrich: String =
    """SELECT c_nationkey, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events JOIN customer ON user_id = c_custkey
       GROUP BY 1 ORDER BY 1"""

  /** Fact-to-dim join + aggregate: revenue per nation (the shape the
    * reference's warehouse summary tables imply, S7). */
  def revenueByNation(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame): DataFrame =
    orders
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_orders"),
        Aggregate.moneySum(col("o_totalprice")).as("total_revenue"))
      .orderBy("nation")

  /** TPC-H Q1-shaped pricing summary over lineitem: per
    * (returnflag, linestatus), quantity/price/discounted/charged sums
    * and averages. Every money product runs entirely in DECIMAL —
    * extprice·(1−disc)·(1+tax) as exact decimal products BEFORE the
    * sum — so partial-aggregation order cannot perturb a bit; the
    * averages divide exact sums as the final (deterministic) IEEE op.
    * One partial+final hash aggregate over a pruned 7-column scan. */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(18,2)")
    val discPrice = discountedPrice(col("l_extendedprice"), col("l_discount"))
    val charge = discPrice * (lit(1).cast("decimal(18,2)") + dec(col("l_tax")))
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val sqlPricingSummary: String =
    """SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
         * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Revenue by part brand: the lineitem ⋈ part star join with the
    * dimension broadcast — per brand, line count and exact discounted
    * revenue. */
  def brandRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val discPrice = discountedPrice(col("l_extendedprice"), col("l_discount"))
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(discPrice).cast("double").as("revenue"))
      .orderBy("p_brand")
  }

  val sqlBrandRevenue: String =
    """SELECT p_brand, count(*) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY 1 ORDER BY 1"""

  /** Supplier account-balance rollup per nation (supplier ⋈ nation,
    * dimension broadcast): the last two driver tables exercised. */
  def supplierBalances(supplier: DataFrame, nation: DataFrame): DataFrame =
    supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_suppliers"),
        Aggregate.moneySum(col("s_acctbal")).as("total_acctbal"),
        (Aggregate.moneySum(col("s_acctbal")) / count(lit(1))).as("avg_acctbal"))
      .orderBy("nation")

  val sqlSupplierBalances: String =
    """SELECT n_name AS nation, count(*) AS n_suppliers,
       CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
       CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_acctbal
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       GROUP BY 1 ORDER BY 1"""

  val ShippingSegment = "BUILDING"
  val ShippingDate = "1998-07-01"
  val ShippingTopK = 10

  /** TPC-H Q3 shape — top-K highest-revenue orders placed before a
    * date but not fully shipped by it, for one market segment: the
    * classic 3-table selective join (customer filter ⋈ orders date
    * filter ⋈ lineitem date filter) ending in a top-K.
    *
    * Scale shape: both date predicates and the segment predicate push
    * into the parquet scans; the two joins shuffle on the natural keys
    * (custkey, orderkey) with AQE free to broadcast the
    * segment-filtered customer side when it fits; revenue sums run in
    * decimal (order-independent); the top-K is TakeOrderedAndProject —
    * per-partition heaps, no global sort exchange. Tie-break on
    * o_orderkey keeps the K rows deterministic across engines. */
  def topUnshippedOrders(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame,
                         segment: String = ShippingSegment,
                         date: String = ShippingDate,
                         k: Int = ShippingTopK): DataFrame =
    customer.filter(col("c_mktsegment") === segment).select("c_custkey")
      .join(orders.filter(col("o_orderdate") < lit(date))
          .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > lit(date))
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(discountedPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(k)

  def sqlTopUnshippedOrders(segment: String = ShippingSegment,
                            date: String = ShippingDate,
                            k: Int = ShippingTopK): String =
    s"""SELECT o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         o_orderpriority,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
           AS DOUBLE) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       WHERE c_mktsegment = ${sqlStr(segment)}
         AND o_orderdate < ${sqlDate(date)}
         AND l_shipdate > ${sqlDate(date)}
       GROUP BY 1, 2, 3
       ORDER BY revenue DESC, o_orderkey ASC
       LIMIT $k"""

  val VolumeRegion = "ASIA"
  val VolumeYearStart = "1996-01-01"
  val VolumeYearEnd = "1997-01-01"

  /** TPC-H Q5 shape — revenue per nation where the CUSTOMER and the
    * SUPPLIER sit in the same nation of one region, for one order
    * year: the 6-table snowflake join with a cross-dimension equality
    * (c_nationkey = s_nationkey) that no single star arm can satisfy
    * alone.
    *
    * Scale shape: the fact side stays lineitem⋈orders⋈customer⋈
    * supplier shuffling on natural keys; nation and region are
    * broadcast; the same-nation constraint rides the supplier join
    * (no extra shuffle); the date predicate prunes the orders scan
    * and the region predicate shrinks the nation broadcast before it
    * ships. Output is region-bounded rows. */
  def localSupplierVolume(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          regionName: String = VolumeRegion,
                          from: String = VolumeYearStart,
                          until: String = VolumeYearEnd): DataFrame =
    lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(orders
          .filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation
          .join(broadcast(region.filter(col("r_name") === regionName)),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(discountedPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("nation").asc)

  def sqlLocalSupplierVolume(regionName: String = VolumeRegion,
                             from: String = VolumeYearStart,
                             until: String = VolumeYearEnd): String =
    s"""SELECT n_name AS nation,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
           AS DOUBLE) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = ${sqlStr(regionName)}
         AND o_orderdate >= ${sqlDate(from)} AND o_orderdate < ${sqlDate(until)}
       GROUP BY 1 ORDER BY revenue DESC, nation ASC"""

  val ReturnedQuarterStart = "1996-10-01"
  val ReturnedQuarterEnd = "1997-01-01"
  val ReturnedTopK = 20

  /** TPC-H Q10 shape — top-K customers by revenue lost to RETURNED
    * items in one order quarter: join-then-aggregate-then-rank at
    * customer grain (much higher cardinality than a nation rollup —
    * the group-by key is the fact side's foreign key).
    *
    * Scale shape: returnflag + date predicates prune both fact scans
    * before the join; the aggregate shuffles on c_custkey (the same
    * key the customer join needs — one exchange serves both under
    * AQE); the final top-K is TakeOrderedAndProject. */
  def returnedItemLosses(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, nation: DataFrame,
                         from: String = ReturnedQuarterStart,
                         until: String = ReturnedQuarterEnd,
                         k: Int = ReturnedTopK): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(orders
          .filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"),
        col("c_acctbal"), col("n_name").as("nation"))
      .agg(sum(discountedPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)

  def sqlReturnedItemLosses(from: String = ReturnedQuarterStart,
                            until: String = ReturnedQuarterEnd,
                            k: Int = ReturnedTopK): String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
           AS DOUBLE) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= ${sqlDate(from)} AND o_orderdate < ${sqlDate(until)}
       GROUP BY 1, 2, 3, 4
       ORDER BY revenue DESC, c_custkey ASC
       LIMIT $k"""
}
