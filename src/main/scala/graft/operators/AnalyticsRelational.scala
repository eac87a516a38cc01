package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.plans.Checkpoints.StableSyntax

/** Relational core of the Analytics family: TPC-H-style aggregates,
  * the join taxonomy (broadcast/semi/anti/outer/as-of/range/bucketed/
  * skew-salted), window functions, top-k, rollup/cube/grouping sets,
  * sketch aggregates (quantile digest, HLL, count-min), scan/layout
  * faces (partition pruning, DPP), and the skyline. Mixed into
  * [[Analytics]]; split from Analytics.scala in r17 (pure refactor).
  */
trait AnalyticsRelational extends AnalyticsBase {
  /** TPC-H Q1-style pricing summary: single scan of lineitem, grouped
    * partial-agg absorbs everything map-side; shuffle volume is
    * O(groups)=O(6). At 100 TB this stays a one-pass scan+combine.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val qc = cents(col("l_quantity"))
    val epc = cents(col("l_extendedprice"))
    val dc = cents(col("l_discount"))   // discount in percent-points
    val tc = cents(col("l_tax"))
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(qc) / 100.0).as("sum_qty"),
        (sum(epc) / 100.0).as("sum_base_price"),
        // product terms reach ~1e11/row: sum in DECIMAL(38,0) so the
        // accumulator cannot overflow int64 at 100 TB scale factors;
        // DuckDB's sum(BIGINT) is already HUGEINT. Both cast the exact
        // integer sum to double before one IEEE division.
        (sum((epc * (lit(100) - dc)).cast("decimal(38,0)")).cast("double") / 10000.0).as("sum_disc_price"),
        (sum((epc * (lit(100) - dc) * (lit(100) + tc)).cast("decimal(38,0)")).cast("double") / 1000000.0).as("sum_charge"),
        (sum(qc) / 100.0 / count(lit(1))).as("avg_qty"),
        (sum(epc) / 100.0 / count(lit(1))).as("avg_price"),
        (sum(dc) / 100.0 / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0 AS sum_disc_price,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT))*(100 + CAST(round(l_tax*100) AS BIGINT)))/1000000.0 AS sum_charge,
      |  sum(CAST(round(l_quantity*100) AS BIGINT))/100.0/count(*) AS avg_qty,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0/count(*) AS avg_price,
      |  sum(CAST(round(l_discount*100) AS BIGINT))/100.0/count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q3
  /** 3-way join + agg + top-k. customer is small → broadcast; the
    * orders⋈lineitem fact-fact leg rides the co-bucketed twin tables
    * (SURVEY §9.2): the sort-merge join consumes the bucketed scan
    * partitioning and the per-order aggregation reuses it (group keys ⊇
    * bucket key), so the whole query has ZERO hash exchanges
    * (plan-asserted in PlanShapeSpec) — at 100 TB the one-time bucketed
    * write amortizes over every fact-fact query, not just one. Top-k is
    * computed after aggregation on O(orders) rows (TakeOrdered, no
    * global sort). Bucketing is physical layout only: the oracle stays
    * over the plain tables and the result is unchanged.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-03-15").cast("timestamp")
    val (oTbl, lTbl) = ensureBucketed(s, dir)
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = s.table(oTbl).filter(col("o_orderdate") < cut)
    val l = s.table(lTbl).filter(col("l_shipdate") > cut)
    l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((sum((cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).cast("decimal(38,0)")).cast("double") / 10000.0).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        fmtDay(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0 AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q5
  /** 5-way join through region/nation: all dims broadcast; the
    * orders⋈lineitem fact-fact leg rides the co-bucketed twin tables
    * like [[q3ShippingPriority]], so the only hash exchange left is
    * the O(nations) post-aggregation one (plan-asserted). Local-
    * supplier condition c_nationkey = s_nationkey. Bucketing is
    * layout, not semantics: the oracle stays over the plain tables.
    */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    val (oTbl, lTbl) = ensureBucketed(s, dir)
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val o = s.table(oTbl).filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val l = s.table(lTbl)
    l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg((sum((cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).cast("decimal(38,0)")).cast("double") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0 AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ------------------------------------------------------- join family
  /** Explicit broadcast hash join of a small dim — no shuffle of the
    * fact side at any scale.
    */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg((sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))

  val joinBroadcastSql: String =
    """SELECT p_brand,
      |  sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
      |  count(*) AS n_items
      |FROM lineitem, part WHERE l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Left-semi: customers having at least one order. Semi-join keeps
    * the build side to keys only — no row multiplication.
    */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  val joinSemiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti: customers with no URGENT order (plain "no orders" is
    * empty at every sf — all customers order).
    */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  val joinAntiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Full-outer join: per-nation customer/supplier presence, nulls
    * where a nation has only one side. Both sides pre-aggregate to
    * O(nations) BEFORE the join, so the outer join itself is tiny at
    * any scale — the 100 TB-safe way to outer-join two fact summaries.
    */
  def joinOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_rich_customers"))
    val sup = t(s, dir, "supplier").filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_rich_suppliers"))
    c.join(sup, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_rich_customers"), lit(0L)).as("n_rich_customers"),
        coalesce(col("n_rich_suppliers"), lit(0L)).as("n_rich_suppliers"))
      .orderBy(col("nationkey"))
  }

  val joinOuterSql: String =
    """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_rich_customers
      |  FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
      |s AS (SELECT s_nationkey AS nationkey, count(*) AS n_rich_suppliers
      |  FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
      |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
      |  coalesce(n_rich_customers, 0) AS n_rich_customers,
      |  coalesce(n_rich_suppliers, 0) AS n_rich_suppliers
      |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
      |ORDER BY nationkey""".stripMargin

  /** Set operators: customers appearing in BOTH predicate sets
    * (INTERSECT) and in the first but not the second (EXCEPT).
    * Spark plans these as left-semi/left-anti aggregates — no row
    * multiplication, distinct absorbed into the join.
    */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val auto = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val high = t(s, dir, "orders").filter(cents(col("o_totalprice")) > 20000000L)
      .select(col("o_custkey"))
    val both = auto.intersect(high).withColumn("set_op", lit("urgent_and_high"))
    val only = auto.except(high).withColumn("set_op", lit("urgent_only"))
    both.union(only)
      .select(col("set_op"), col("o_custkey"))
      .orderBy(col("set_op"), col("o_custkey"))
  }

  val setOpsSql: String =
    """WITH u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |h AS (SELECT o_custkey FROM orders WHERE CAST(round(o_totalprice*100) AS BIGINT) > 20000000)
      |SELECT 'urgent_and_high' AS set_op, o_custkey FROM (SELECT o_custkey FROM u INTERSECT SELECT o_custkey FROM h)
      |UNION ALL
      |SELECT 'urgent_only' AS set_op, o_custkey FROM (SELECT o_custkey FROM u EXCEPT SELECT o_custkey FROM h)
      |ORDER BY set_op, o_custkey""".stripMargin

  /** RANGE-frame window: per-user value sum over the trailing 1-hour
    * EVENT-TIME interval (not a row count) — the time-decayed feature
    * shape. Frame bounds are in microseconds over a long ordering
    * column, identical semantics on both engines.
    */
  def windowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        cents(col("value")).as("vc"))
      .select(col("user_id"), col("event_id"), col("us"),
        (sum(col("vc")).over(w) / 100.0).as("trailing_1h_value"),
        count(lit(1)).over(w).as("trailing_1h_events"))
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  val windowRangeFrameSql: String =
    """SELECT user_id, event_id, epoch_us(ts) AS us,
      |  sum(CAST(round(value*100) AS BIGINT)) OVER w / 100.0 AS trailing_1h_value,
      |  count(*) OVER w AS trailing_1h_events
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, us, event_id""".stripMargin

  // ------------------------------------------------------ aggregations
  /** count(distinct) per group — Spark plans this as a two-phase
    * partial/final distinct aggregate, no driver collection.
    */
  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  val aggDistinctSql: String =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------- windows
  /** rank() over a partitioned window. Rank ties on equal acctbal are
    * engine-stable (rank, not row_number).
    */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(cents(col("c_acctbal")).desc)
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).cast("long").as("bal_rank"))
      .orderBy(col("c_mktsegment"), col("bal_rank"), col("c_custkey"))
  }

  val windowRankSql: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  rank() OVER (PARTITION BY c_mktsegment ORDER BY CAST(round(c_acctbal*100) AS BIGINT) DESC) AS bal_rank
      |FROM customer ORDER BY c_mktsegment, bal_rank, c_custkey""".stripMargin

  /** Running sum + lag delta over event time, per user. Explicit ROWS
    * frame: the running sum is evaluated left-to-right over an exact
    * integer, so it is order- and engine-stable.
    */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vc = cents(col("value"))
    events(s, dir)
      .select(col("user_id"), col("event_id"), fmtTs(col("ts")).as("ts"),
        col("value"),
        (sum(vc).over(wRun) / 100.0).as("running_sum"),
        ((vc - lag(vc, 1).over(w)) / 100.0).as("delta"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val windowRunningSql: String =
    """SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, value,
      |  sum(CAST(round(value*100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0 AS running_sum,
      |  (CAST(round(value*100) AS BIGINT) - lag(CAST(round(value*100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id))/100.0 AS delta
      |FROM events ORDER BY user_id, ts, event_id""".stripMargin

  /** row_number ≤ k per group (top-3 orders per customer by price),
    * tie-broken on orderkey so the pick is deterministic.
    */
  def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(cents(col("o_totalprice")).desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  val topkPerGroupSql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Top-k per group via the custom physical operator
    * [[graft.plans.TopKPerGroup]] (LogicalPlan + Strategy + SparkPlan)
    * — the bounded-state twin of [[topkPerGroup]]. The window
    * formulation totally sorts every group after a full shuffle; this
    * one prunes each partition to ≤ k rows per group BEFORE the
    * exchange (partial stage) and merges after (final stage), all on
    * UnsafeRows — the 100 TB shape with no encoder ser/de (which the
    * earlier [[graft.functions.TopKAggregator]] formulation paid; that
    * Aggregator remains as the spec's independent cross-check). Same
    * output, same oracle.
    */
  def topkPerGroupAgg(s: SparkSession, dir: String): DataFrame =
    graft.plans.GraftOps.topKPerGroup(
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            cents(col("o_totalprice")).as("__sk")),
        Seq("o_custkey"),
        Seq("__sk" -> true, "o_orderkey" -> false),
        k = 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))

  /** The r1 typed-Aggregator formulation — spec-only cross-check for
    * the custom operator (kept off the registry).
    */
  def topkPerGroupAggTyped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select(col("o_custkey"), cents(col("o_totalprice")).as("sk"),
        col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3, r._4))
      .agg(graft.functions.TopKAggregator.topK(3).toColumn.name("top"))
      .flatMap { case (cust, tops) =>
        tops.iterator.zipWithIndex.map { case ((_, id, price), i) =>
          (cust, id, price, (i + 1).toLong)
        }
      }
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy(col("o_custkey"), col("rn"))
  }

  // ------------------------------------------------------------ pivot
  /** ROLLUP (r_name, n_name) revenue hierarchy. Subtotal rows carry
    * NULLs; ordering pins NULLS FIRST explicitly on both engines.
    */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg((sum(cents(col("o_totalprice"))) / 100.0).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  val rollupRevenueSql: String =
    """SELECT r_name, n_name,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS revenue,
      |  count(*) AS n_orders
      |FROM orders, customer, nation, region
      |WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------------ time windows
  /** CUBE over (region, priority): all four grouping-set combinations
    * in one pass (Spark expands to a single shuffle with grouping-id).
    */
  def cubeRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("o_orderpriority"))
      .agg((sum(cents(col("o_totalprice"))) / 100.0).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("o_orderpriority"))

  val cubeRevenueSql: String =
    """SELECT r_name, o_orderpriority,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS revenue,
      |  count(*) AS n_orders
      |FROM orders, customer, nation, region
      |WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |GROUP BY CUBE (r_name, o_orderpriority)
      |ORDER BY r_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------------- sessionize
  /** As-of join, expressed without a join: attribute each event to the
    * user's most recent signup at-or-before it. A single windowed pass
    * (running max over the tagged timestamp) — at 100 TB this is one
    * shuffle on user_id instead of a range-join explosion, and it's the
    * composition-first answer to "Spark lacks ASOF JOIN".
    */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("us"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("asof_signup_us",
        max(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("delta_sec",
        (col("us") - col("asof_signup_us")) / 1000000.0)
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  val joinAsofSql: String =
    """SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
      |  max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
      |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_us,
      |  (epoch_us(ts) - max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
      |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) / 1000000.0 AS delta_sec
      |FROM events
      |ORDER BY user_id, us, event_id""".stripMargin

  /** FORWARD as-of join (r14 wave 32 — the direction the family
    * lacked: [[joinAsof]] attributes each event to the latest signup
    * AT OR BEFORE it, this face to the EARLIEST purchase STRICTLY
    * AFTER it — the "time until next conversion" attribution a
    * marketing-response model trains on, and the label-side mirror of
    * the feature-side backward as-of). Same join-free single-window
    * shape: one user-keyed sort, a min-over-following frame, exact
    * integer micros; events after the user's last purchase stay NULL
    * (right-censored — the consumer applies [[eventsSurvival]]'s
    * censoring discipline, not a fake horizon).
    *
    * TIE RULE (pinned): "strictly after" means strictly after in the
    * (us, event_id) ROW ORDER, not in time — the ROWS (1,
    * unboundedFollowing) frame is positional, so a purchase sharing
    * the event's exact microsecond but carrying a LARGER event_id
    * counts as the next purchase (and one with a smaller event_id
    * does not). Deterministic (the sort key is a total order) and
    * identical in both engines; the spec pins the same-microsecond
    * case explicitly.
    *
    * == Scale design ==
    * ONE scan, one user-keyed shuffle serving the single window — no
    * range join, no self-join; the frame is
    * (currentRow+1, unboundedFollowing) over the same sort the
    * backward face pays.
    */
  def joinAsofForward(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_purchase_us",
        min(when(col("event_type") === "purchase", col("us"))).over(w))
      .withColumn("ttc_sec",
        (col("next_purchase_us") - col("us")) / 1000000.0)
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  val joinAsofForwardSql: String =
    """SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
      |  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
      |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase_us,
      |  (min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
      |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |   - epoch_us(ts)) / 1000000.0 AS ttc_sec
      |FROM events
      |ORDER BY user_id, us, event_id""".stripMargin

  /** As-of join with a STALENESS BOUND — the feature-correctness knob
    * [[joinAsof]] lacks: a point-in-time feature older than the
    * tolerance (7 days here) is usually worse than no feature, so the
    * stale match is NULLED and FLAGGED rather than silently served
    * (the ML-serving "max feature age" rule; Feast's ttl). Same
    * join-free single-window shape as the plain as-of — the tolerance
    * is pure column arithmetic on top — with gap kept in exact micros.
    * At sf0.01: 9109 fresh / 193 stale / 698 never-matched, so all
    * three states are exercised by the gate.
    */
  def joinAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val TOL = 7L * 86400L * 1000000L // 7 days in micros
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("raw_asof",
        max(when(col("event_type") === "signup", col("us"))).over(w))
      .select(col("event_id"), col("user_id"), col("us"),
        when(col("us") - col("raw_asof") <= TOL, col("raw_asof")).as("asof_us"),
        when(col("us") - col("raw_asof") <= TOL, col("us") - col("raw_asof")).as("gap_us"),
        (col("raw_asof").isNotNull && col("us") - col("raw_asof") > TOL).as("stale"))
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  val joinAsofToleranceSql: String =
    """WITH a AS (SELECT event_id, user_id, epoch_us(ts) AS us,
      |    max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS raw
      |  FROM events)
      |SELECT event_id, user_id, us,
      |  CASE WHEN us - raw <= 604800000000 THEN raw END AS asof_us,
      |  CASE WHEN us - raw <= 604800000000 THEN us - raw END AS gap_us,
      |  COALESCE(raw IS NOT NULL AND us - raw > 604800000000, FALSE) AS stale
      |FROM a ORDER BY user_id, us, event_id""".stripMargin

  // ----------------------------------------------------------- range join
  /** Range (interval) join: every event within 1 hour AFTER a
    * purchase by the same user. Expressed as a bucketized equi-join:
    * both sides key on floor(us / window), the purchase side probes
    * its bucket and the next, and the exact range predicate filters
    * after the equi-match. At 100 TB this shuffles on uniform bucket
    * keys instead of exploding a cartesian/BNL range join.
    */
  def joinRange(s: SparkSession, dir: String): DataFrame = {
    val W = 3600L * 1000000L // 1-hour window, micros
    val e = events(s, dir).select(col("event_id"), col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("us").as("p_us"),
        explode(array((col("us") / W).cast("long"),
          (col("us") / W).cast("long") + 1)).as("bucket"))
    val probes = e.select(col("user_id").as("e_user"), col("event_id").as("probe_id"),
      col("event_type").as("probe_type"), col("us").as("e_us"),
      (col("us") / W).cast("long").as("bucket"))
    purchases.join(probes,
        purchases("bucket") === probes("bucket") && col("p_user") === col("e_user")
          && col("e_us") > col("p_us") && col("e_us") <= col("p_us") + W)
      .select(col("purchase_id"), col("probe_id"), col("probe_type"),
        ((col("e_us") - col("p_us")) / 1000000.0).as("delta_sec"))
      .orderBy(col("purchase_id"), col("probe_id"))
  }

  val joinRangeSql: String =
    """SELECT p.event_id AS purchase_id, e.event_id AS probe_id,
      |  e.event_type AS probe_type,
      |  (epoch_us(e.ts) - epoch_us(p.ts)) / 1000000.0 AS delta_sec
      |FROM events p JOIN events e
      |  ON p.event_type = 'purchase' AND p.user_id = e.user_id
      |  AND epoch_us(e.ts) > epoch_us(p.ts)
      |  AND epoch_us(e.ts) <= epoch_us(p.ts) + 3600000000
      |ORDER BY purchase_id, probe_id""".stripMargin

  /** Bloom-filter pre-join: build an executor-side Bloom sketch over
    * URGENT orders' custkeys with Spark's native `BloomFilterAggregate`
    * (mergeable partials — the build side never funnels through the
    * driver) and probe with `BloomFilterMightContain` (codegen'd, no
    * UDF), the classic 100 TB technique for shrinking the probe side
    * before a shuffle join. The sketch reaches the probe as a scalar
    * subquery — exactly how Spark's own runtime row-level filtering
    * wires it. Bloom admits false positives, so the registered query
    * keeps the exact semi-join as the verify step behind the sketch:
    * output = the exact URGENT-customer set (bloom has no false
    * negatives) ⇒ full DuckDB oracle; the spec additionally bounds the
    * sketch's false-positive pass-through.
    */
  def filterBloom(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerBloom(s)
    t(s, dir, "orders").createOrReplaceTempView("graft_fb_orders")
    t(s, dir, "customer").createOrReplaceTempView("graft_fb_customer")
    s.sql(
      """SELECT c_custkey, c_name FROM graft_fb_customer
        |WHERE graft_might_contain(
        |    (SELECT graft_bloom_agg(o_custkey, CAST(10000 AS BIGINT), CAST(100000 AS BIGINT))
        |     FROM graft_fb_orders WHERE o_orderpriority = '1-URGENT'),
        |    c_custkey)
        |  AND EXISTS (SELECT 1 FROM graft_fb_orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  val filterBloomSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------- percentiles/sketches
  /** Exact interpolated percentiles per group (the correctness twin of
    * the sketch below). Both engines interpolate at p·(n−1).
    */
  def aggPercentile(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"))
      .orderBy(col("event_type"))

  val aggPercentileSql: String =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90,
      |  quantile_cont(value, 0.99) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Approximate-quantile BOUND CERTIFICATE (r20): runs Spark's
    * percentile_approx sketch (GK, accuracy 10000 — the 100 TB path:
    * fixed-size mergeable state, single pass) and NOTARIZES it in rank
    * space, the space the sketch's guarantee lives in. The hashed
    * output carries n, the exact percentiles, the documented slack
    * (ε·n + 2 ranks, ε = 1/accuracy) and `*_ok` = 1 iff the counted
    * rank of the estimate sits within slack of p·n. The estimate
    * itself never reaches the hashed columns — DuckDB has no GK twin —
    * but the ok flags are computed FROM it on the Spark side while the
    * oracle pins them to 1, so a sketch regression breaks the hash
    * gate rather than hiding behind a rows-only check. Production
    * keeps the sketch alone; the exact pass is the certificate's cost
    * (one corpus scan + a 5-row broadcast join-back).
    */
  def aggApproxQuantile(s: SparkSession, dir: String): DataFrame = {
    // The GK guarantee is a RANK statement — |rank(est) − p·n| ≤ ε·n —
    // so the certificate is checked in rank space (a value bracket at
    // p ± ε collapses below one order-statistic gap at small n and
    // fails spuriously — measured at sf0.001 in r20). The 5-row
    // estimate relation is broadcast back onto the corpus and each
    // estimate's rank is counted in the same single scan that computes
    // the exact percentiles; slack_ranks = ε·n + 2 covers the sketch's
    // ε·n plus the ±1 target-rank discreteness on each side.
    val qs = Seq(0.5, 0.9, 0.99)
    val eps = 1.0 / 10000.0
    val ev = events(s, dir)
    val est = ev.groupBy(col("event_type"))
      .agg(expr(s"percentile_approx(value, array(${qs.mkString(",")}), 10000)").as("est"))
    val slack = col("n_values").cast("double") * lit(eps) + lit(2.0)
    def okFlag(i: Int): Column = {
      val target = lit(qs(i)) * col("n_values").cast("double")
      (col(s"lt$i").cast("double") <= target + slack &&
        col(s"le$i").cast("double") >= target - slack).cast("long")
    }
    val rankAggs = qs.indices.flatMap { i =>
      Seq(sum(when(col("value") < col("est")(i), 1L).otherwise(0L)).as(s"lt$i"),
        sum(when(col("value") <= col("est")(i), 1L).otherwise(0L)).as(s"le$i"))
    }
    ev.join(broadcast(est), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_values"),
        (expr(s"percentile(value, array(${qs.mkString(",")}))").as("px")
          +: rankAggs): _*)
      .select(col("event_type"), col("n_values"),
        col("px")(0).as("p50_exact"), col("px")(1).as("p90_exact"),
        col("px")(2).as("p99_exact"), slack.as("slack_ranks"),
        okFlag(0).as("p50_ok"), okFlag(1).as("p90_ok"), okFlag(2).as("p99_ok"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of the quantile certificate: exact percentiles replay
    * with quantile_cont (interpolation proven identical by
    * [[aggPercentileSql]]'s hash row), slack replays the same double
    * arithmetic, and the ok flags are pinned to 1 — the Spark side
    * computes them from the live sketch's counted rank, so any rank
    * violation is a hash mismatch. */
  val aggApproxQuantileSql: String =
    """SELECT event_type, count(*) AS n_values,
      |  quantile_cont(value, 0.5) AS p50_exact,
      |  quantile_cont(value, 0.9) AS p90_exact,
      |  quantile_cont(value, 0.99) AS p99_exact,
      |  CAST(count(*) AS DOUBLE) * CAST(0.0001 AS DOUBLE) + 2.0 AS slack_ranks,
      |  CAST(1 AS BIGINT) AS p50_ok, CAST(1 AS BIGINT) AS p90_ok,
      |  CAST(1 AS BIGINT) AS p99_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Approx-distinct BOUND CERTIFICATE (r20): HyperLogLog++ at
    * rsd = 0.02 per event type, notarized against the exact distinct
    * count in the same aggregate. Hashed columns: exact count, row
    * count, the documented bound (3.5σ = 7% of exact, floor 2 — the
    * spec's bound since r19), and `within_bound` = 1 iff
    * |est − exact| ≤ bound; the oracle pins the flag to 1 while Spark
    * computes it from the live sketch. The 0.07 multiplier is cast to
    * DOUBLE on both sides so ceil sees the identical IEEE value. At
    * 100 TB production keeps the sketch alone (mergeable fixed-size
    * registers, no distinct shuffle); the exact column is the
    * certificate's cost.
    */
  def aggApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val bound = greatest(lit(2L), ceil(col("n_exact_users") * lit(0.07)).cast("long"))
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("est"),
        countDistinct(col("user_id")).as("n_exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_exact_users"), col("n_events"),
        bound.as("bound"),
        (abs(col("est") - col("n_exact_users")) <= bound)
          .cast("long").as("within_bound"))
      .orderBy(col("event_type"))
  }

  val aggApproxDistinctSql: String =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_exact_users,
      |  count(*) AS n_events,
      |  GREATEST(CAST(2 AS BIGINT),
      |    CAST(ceil(count(DISTINCT user_id) * CAST(0.07 AS DOUBLE)) AS BIGINT)) AS bound,
      |  CAST(1 AS BIGINT) AS within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Deterministic exact digest of EXACTLY the multiset
    * [[aggApproxQuantile]] sketches: per event_type — row count,
    * integer-cents sum, min/max value. Full hash oracle (SURVEY §9.3):
    * the t-digest itself has no DuckDB twin, but this pins that the
    * sketch consumed the right input relation, complementing the
    * spec's error bound against [[aggPercentile]].
    */
  def aggApproxQuantileInputs(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_values"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("event_type"))

  val aggApproxQuantileInputsSql: String =
    """SELECT event_type, count(*) AS n_values,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value,
      |  min(value) AS min_value, max(value) AS max_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** HLL twin of [[aggApproxQuantileInputs]]: the exact per-type
    * distinct-user relation [[aggApproxDistinct]] estimates, with the
    * key-range digest. Full hash oracle.
    */
  def aggApproxDistinctInputs(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact_users"),
        count(lit(1)).as("n_events"),
        min(col("user_id")).as("min_user"),
        max(col("user_id")).as("max_user"))
      .orderBy(col("event_type"))

  val aggApproxDistinctInputsSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_exact_users,
      |  count(*) AS n_events, min(user_id) AS min_user, max(user_id) AS max_user
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------- replayable quantile sketch
  /** A quantile sketch whose ESTIMATE is hash-checkable — the
    * fixed-grid completion of the sketch family (CMS and HLL already
    * replay; quantiles rode the opaque native t-digest): value cents
    * fold into 64-cent grid buckets whose counts ARE the sketch
    * (mergeable by plain addition — see [[aggQuantileUnion]]), and the
    * q-quantile estimate is the midpoint of the first bucket whose
    * cumulative count reaches the target rank ⌈q·N⌉. Grid geometry
    * bounds the error at ±32 cents BY CONSTRUCTION (the exact rank-t
    * value lives inside the chosen bucket) — the spec asserts the
    * bound, and the EXACT rank-t value rides alongside as the honesty
    * column, computed from the same grouped-cents relation. The native
    * `percentile_approx` key stays registered as the production twin.
    *
    * == Scale design ==
    * ONE scan folds events onto the O(|value domain|) distinct-cents
    * relation map-side; the sketch is a second fold of that relation
    * onto O(domain/64) buckets. Both cumulative windows run over
    * BOUNDED relations (domain-sized, not corpus-sized — the
    * WindowExec single-partition warning is the documented
    * bounded-relation case). A production grid over an unbounded
    * domain clamps or log-scales the bucket map; this corpus's value
    * domain is the bounded ops-metric case the fixed grid is built
    * for.
    */
  def aggQuantileReplay(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = events(s, dir).select(cents(col("value")).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .stableCheckpoint()
    val n = c.agg(sum(col("cnt")).as("n"))
    val qs = s.createDataFrame(Seq(250L, 500L, 750L, 900L, 990L)
      .map(Tuple1.apply)).toDF("q_permille")
    val t = qs.crossJoin(broadcast(n))
      .withColumn("target_rank", expr("(q_permille * n + 999) div 1000"))
    val cumFrame = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = c.withColumn("cum", sum(col("cnt")).over(cumFrame))
    val exact = t.join(cum, col("cum") >= col("target_rank"))
      .groupBy(col("q_permille"), col("target_rank"), col("n"))
      .agg(min(col("v")).as("exact_cents"))
    val sk = c.groupBy(expr("v div 64").as("b")).agg(sum(col("cnt")).as("bcnt"))
    val cumB = sk.withColumn("cumb", sum(col("bcnt")).over(
      Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val est = t.select(col("q_permille"), col("target_rank"))
      .join(cumB, col("cumb") >= col("target_rank"))
      .groupBy(col("q_permille")).agg(min(col("b")).as("b"))
      .select(col("q_permille"), (col("b") * 64L + 32L).as("est_cents"))
    exact.join(est, "q_permille")
      .select(col("q_permille"), col("target_rank"), col("n"),
        col("est_cents"), col("exact_cents"),
        (col("est_cents") - col("exact_cents")).as("err_cents"))
      .orderBy(col("q_permille"))
  }

  val aggQuantileReplaySql: String =
    """WITH c AS (SELECT CAST(round(value*100) AS BIGINT) AS v, count(*) AS cnt
      |  FROM events GROUP BY 1),
      |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
      |qs AS (SELECT unnest(CAST([250,500,750,900,990] AS BIGINT[])) AS q_permille),
      |t AS (SELECT q_permille, (q_permille * n + 999) // 1000 AS target_rank, n
      |  FROM qs CROSS JOIN nn),
      |cum AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum FROM c),
      |ex AS (SELECT q_permille, target_rank, n, min(v) AS exact_cents
      |  FROM t JOIN cum ON cum.cum >= t.target_rank GROUP BY 1, 2, 3),
      |sk AS (SELECT v // 64 AS b, CAST(sum(cnt) AS BIGINT) AS bcnt FROM c GROUP BY 1),
      |cb AS (SELECT b, CAST(sum(bcnt) OVER (ORDER BY b) AS BIGINT) AS cumb FROM sk),
      |es AS (SELECT q_permille, min(b) AS b
      |  FROM t JOIN cb ON cb.cumb >= t.target_rank GROUP BY 1)
      |SELECT ex.q_permille, ex.target_rank, ex.n,
      |  es.b * 64 + 32 AS est_cents, ex.exact_cents,
      |  es.b * 64 + 32 - ex.exact_cents AS err_cents
      |FROM ex JOIN es USING (q_permille) ORDER BY q_permille""".stripMargin

  /** Sketch ALGEBRA on the grid-quantile registers — the HLL-union
    * pattern applied to quantiles: the two time windows' sketches
    * ([[graft.operators.Maintain.dqDrift]]'s epoch cut) MERGE by
    * register-wise ADDITION (counting registers merge exactly, unlike
    * HLL's lossy max), and the merged estimate is printed beside the
    * estimate of a sketch built DIRECTLY over the union — the two
    * must agree bucket-for-bucket, which the hash gate certifies. The
    * per-window medians/p90s are the real dashboard quantities: the
    * quantile-drift face of dq_drift, computed entirely from O(domain
    * /64) mergeable state without re-touching raw data.
    *
    * == Scale design ==
    * Two scans (the split sketch and the independent direct build —
    * the second exists purely as the cross-check target), each folding
    * map-side onto O(domain/64) buckets; merge cost is register-table
    * size, never a re-scan — a backfill∪live merge at 100 TB adds two
    * 900-row tables.
    */
  def aggQuantileUnion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cut = lit("2024-01-16").cast("timestamp")
    // the split sketch is checkpointed: the three stacked faces and
    // their totals/cumsums all read the O(domain/64) register table,
    // not the fact — leaving exactly two events scans (this one and
    // the deliberately independent direct build below)
    val sk = events(s, dir)
      .select(cents(col("value")).as("v0"),
        (col("ts") < cut).cast("long").as("is_ref"))
      .select(expr("v0 div 64").as("b"), col("is_ref"))
      .groupBy(col("b"))
      .agg(sum(col("is_ref")).as("ref_cnt"),
        sum(lit(1L) - col("is_ref")).as("cur_cnt"))
      .stableCheckpoint()
    val direct = events(s, dir)
      .select(cents(col("value")).as("v0"))
      .select(expr("v0 div 64").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
      .select(col("b"), lit("direct").as("face"), col("cnt"))
    val stacked = sk.select(col("b"), expr(
        "stack(3, 'ref', ref_cnt, 'cur', cur_cnt, 'merged', ref_cnt + cur_cnt) AS (face, cnt)"))
      .select(col("b"), col("face"), col("cnt"))
      .union(direct.select(col("b"), col("face"), col("cnt")))
    val tot = stacked.groupBy(col("face")).agg(sum(col("cnt")).as("n"))
    val cum = stacked.withColumn("cum", sum(col("cnt")).over(
      Window.partitionBy(col("face")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val qs = s.createDataFrame(Seq(500L, 900L).map(Tuple1.apply)).toDF("q_permille")
    val t = qs.crossJoin(broadcast(tot))
      .withColumn("target_rank", expr("(q_permille * n + 999) div 1000"))
    // cum shares lineage with tot (both fold `stacked`): rename its
    // face so the equi-join predicate binds the two sides, not one
    val cumR = cum.select(col("face").as("cface"), col("b"), col("cum"))
    t.join(cumR, col("cface") === col("face") && col("cum") >= col("target_rank"))
      .groupBy(col("face"), col("q_permille"), col("n"), col("target_rank"))
      .agg(min(col("b")).as("b"))
      .select(col("q_permille"), col("face"), col("n"), col("target_rank"),
        (col("b") * 64L + 32L).as("est_cents"))
      .orderBy(col("q_permille"), col("face"))
  }

  val aggQuantileUnionSql: String =
    """WITH e AS (SELECT CAST(round(value*100) AS BIGINT) // 64 AS b,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref
      |  FROM events),
      |sk AS (SELECT b, CAST(sum(is_ref) AS BIGINT) AS ref_cnt,
      |    CAST(sum(1 - is_ref) AS BIGINT) AS cur_cnt
      |  FROM e GROUP BY b),
      |stacked AS (
      |  SELECT b, 'ref' AS face, ref_cnt AS cnt FROM sk
      |  UNION ALL SELECT b, 'cur', cur_cnt FROM sk
      |  UNION ALL SELECT b, 'merged', ref_cnt + cur_cnt FROM sk
      |  UNION ALL SELECT b, 'direct', count(*) FROM e GROUP BY b),
      |tot AS (SELECT face, CAST(sum(cnt) AS BIGINT) AS n FROM stacked GROUP BY 1),
      |cum AS (SELECT face, b, CAST(sum(cnt) OVER (PARTITION BY face ORDER BY b) AS BIGINT) AS cum
      |  FROM stacked),
      |qs AS (SELECT unnest(CAST([500,900] AS BIGINT[])) AS q_permille),
      |t AS (SELECT q_permille, face, n, (q_permille * n + 999) // 1000 AS target_rank
      |  FROM qs CROSS JOIN tot)
      |SELECT t.q_permille, t.face, t.n, t.target_rank,
      |  min(cum.b) * 64 + 32 AS est_cents
      |FROM t JOIN cum ON cum.face = t.face AND cum.cum >= t.target_rank
      |GROUP BY 1, 2, 3, 4
      |ORDER BY t.q_permille, t.face""".stripMargin

  /** Grid-width tuning curve for the replayable quantile sketch — the
    * [[aggHllCurve]] move applied to quantiles (the read-BEFORE-choosing
    * table for the production grid width): the SAME distinct-cents
    * relation sketched at bucket widths W ∈ {16, 64, 256} cents, each
    * (W, q) estimate printed beside the exact rank-⌈q·N⌉ value with the
    * signed error and the geometry bound W div 2 — |err| ≤ bound holds
    * BY CONSTRUCTION (the exact value lives inside the chosen bucket;
    * the spec asserts the bound and pins the W=64 rows equal to
    * [[aggQuantileReplay]]'s). Halving the error costs a doubling of
    * register state — the 1/W law read off before choosing a width,
    * exactly as [[aggHllCurve]] reads off 1/√m before choosing m.
    *
    * == Scale design ==
    * ONE scan folds events map-side onto the O(|value domain|)
    * distinct-cents relation (stableCheckpointed); the 3-config fan-out
    * rides THAT relation (×3 of domain-sized, never of corpus) and
    * folds onto O(Σ domain/W) buckets. The cumulative windows run over
    * bounded relations — the documented bounded-relation
    * single-partition case.
    */
  def aggQuantileCurve(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = events(s, dir).select(cents(col("value")).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .stableCheckpoint()
    val n = c.agg(sum(col("cnt")).as("n"))
    val ws = s.createDataFrame(Seq(16L, 64L, 256L).map(Tuple1.apply)).toDF("w")
    val qs = s.createDataFrame(Seq(500L, 900L).map(Tuple1.apply)).toDF("q_permille")
    val cumFrame = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = c.withColumn("cum", sum(col("cnt")).over(cumFrame))
    val exact = qs.crossJoin(broadcast(n))
      .withColumn("target_rank", expr("(q_permille * n + 999) div 1000"))
      .join(cum, col("cum") >= col("target_rank"))
      .groupBy(col("q_permille")).agg(min(col("v")).as("exact_cents"))
    val sk = c.crossJoin(broadcast(ws))
      .groupBy(col("w"), expr("v div w").as("b")).agg(sum(col("cnt")).as("bcnt"))
    val cumB = sk.withColumn("cumb", sum(col("bcnt")).over(
        Window.partitionBy(col("w")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("w").as("cw"), col("b"), col("cumb"))
    val t = qs.crossJoin(ws).crossJoin(broadcast(n))
      .withColumn("target_rank", expr("(q_permille * n + 999) div 1000"))
    val est = t.join(cumB, col("cw") === col("w") && col("cumb") >= col("target_rank"))
      .groupBy(col("w"), col("q_permille"), col("target_rank"), col("n"))
      .agg(min(col("b")).as("b"))
    est.join(broadcast(exact), "q_permille")
      .select(col("w").as("width_cents"), col("q_permille"), col("target_rank"),
        col("n"),
        (col("b") * col("w") + expr("w div 2")).as("est_cents"),
        col("exact_cents"),
        (col("b") * col("w") + expr("w div 2") - col("exact_cents")).as("err_cents"),
        expr("w div 2").as("bound_cents"))
      .orderBy(col("width_cents"), col("q_permille"))
  }

  /** DuckDB twin: same distinct-cents relation, per-width bucket lanes,
    * identical rank arithmetic. */
  val aggQuantileCurveSql: String =
    """WITH c AS (SELECT CAST(round(value*100) AS BIGINT) AS v, count(*) AS cnt
      |  FROM events GROUP BY 1),
      |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
      |ws AS (SELECT unnest(CAST([16,64,256] AS BIGINT[])) AS w),
      |qs AS (SELECT unnest(CAST([500,900] AS BIGINT[])) AS q_permille),
      |cum AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum FROM c),
      |ex AS (SELECT q_permille, min(v) AS exact_cents
      |  FROM (SELECT q_permille, (q_permille * n + 999) // 1000 AS target_rank
      |        FROM qs CROSS JOIN nn) tq
      |  JOIN cum ON cum.cum >= tq.target_rank GROUP BY 1),
      |sk AS (SELECT w, v // w AS b, CAST(sum(cnt) AS BIGINT) AS bcnt
      |  FROM c CROSS JOIN ws GROUP BY 1, 2),
      |cb AS (SELECT w, b, CAST(sum(bcnt) OVER (PARTITION BY w ORDER BY b) AS BIGINT) AS cumb
      |  FROM sk),
      |t AS (SELECT w, q_permille, (q_permille * n + 999) // 1000 AS target_rank, n
      |  FROM ws CROSS JOIN qs CROSS JOIN nn),
      |es AS (SELECT t.w, t.q_permille, t.target_rank, t.n, min(cb.b) AS b
      |  FROM t JOIN cb ON cb.w = t.w AND cb.cumb >= t.target_rank
      |  GROUP BY 1, 2, 3, 4)
      |SELECT es.w AS width_cents, es.q_permille, es.target_rank, es.n,
      |  es.b * es.w + es.w // 2 AS est_cents, ex.exact_cents,
      |  es.b * es.w + es.w // 2 - ex.exact_cents AS err_cents,
      |  es.w // 2 AS bound_cents
      |FROM es JOIN ex USING (q_permille)
      |ORDER BY width_cents, q_permille""".stripMargin

  // ------------------------------------------- bucketed fact-fact join
  /** Corpora whose bucketed twin tables are already written. Keyed by
    * SESSION identity + corpus FILE SIGNATURE: the saveAsTable
    * artifacts live in a session-scoped catalog, so a second
    * SparkSession in the same JVM (fresh in-memory catalog after a
    * stop/start) must re-create them rather than ride a stale
    * JVM-global memo into TABLE_NOT_FOUND. Rewriting the data at a
    * path still invalidates via the signature half of the key.
    */
  private val bucketedReady = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def fileSig(s: SparkSession, dir: String, names: String*): String =
    names.map { name =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      try fs.listStatus(p).map(st => s"${st.getPath}:${st.getLen}:${st.getModificationTime}")
        .sorted.mkString(",")
      catch { case _: java.io.FileNotFoundException => s"$name:missing" }
    }.mkString("|")

  /** Write orders/lineitem as co-bucketed tables (8 buckets on the join
    * key, sorted within buckets) once per corpus per session. The table
    * NAME carries a hash of the corpus signature, so two signatures for
    * one dir can never race on the same warehouse path. A previous JVM
    * may have left the warehouse location behind after its catalog
    * entry died with it, so the location is cleared explicitly before
    * the CTAS. A memo hit whose tables are gone from the catalog
    * (external DROP, or a memo key that outlived its catalog) is
    * self-healing: the key is dropped and the tables re-created.
    *
    * Columns cover every consumer: [[joinBucketed]] (totalprice,
    * priority), [[q3ShippingPriority]]'s fact-fact leg (custkey,
    * orderdate, shipdate), and the [[TpcH]] family (quantity,
    * returnflag, partkey for q9's part join, orderstatus for q21).
    */
  private[operators] def ensureBucketed(s: SparkSession, dir: String): (String, String) = {
    // v2 layout: + o_orderstatus (TpcH q21) and l_partkey (TpcH q9).
    // The version participates in the signature (and thus the table
    // name), so a warehouse left behind by an older layout can never
    // satisfy a newer consumer's column set.
    val sig = "v2|" + fileSig(s, dir, "orders", "lineitem")
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + java.lang.Long.toHexString(sig.hashCode.toLong & 0xffffffffL)
    val (oTbl, lTbl) = (s"graft_orders_$tag", s"graft_lineitem_$tag")
    val key = s"${System.identityHashCode(s)}|$dir|$sig"
    if (bucketedReady.containsKey(key) &&
        !(s.catalog.tableExists(oTbl) && s.catalog.tableExists(lTbl)))
      bucketedReady.remove(key)
    bucketedReady.computeIfAbsent(key, _ => {
      val hconf = s.sparkContext.hadoopConfiguration
      Seq(oTbl, lTbl).foreach { tbl =>
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        val loc = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")), tbl)
        loc.getFileSystem(hconf).delete(loc, true)
      }
      Tables.writeBucketed(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate",
          "o_totalprice", "o_orderpriority", "o_orderstatus"),
        oTbl, 8, "o_orderkey", "o_orderkey")
      Tables.writeBucketed(
        t(s, dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount", "l_shipdate", "l_quantity",
          "l_returnflag"),
        lTbl, 8, "l_orderkey", "l_orderkey")
      tag
    })
    (oTbl, lTbl)
  }

  /** Fact-fact join with ZERO shuffle exchanges (SURVEY §5/§9.4): both
    * sides are pre-bucketed on the join key, so the sort-merge join
    * consumes the bucketed scan partitioning directly, and the per-order
    * aggregation reuses the same partitioning (group keys ⊇ bucket key).
    * This is the 100 TB orders⋈lineitem story made plan-visible: the
    * one-time bucketed write amortizes over every subsequent join, and
    * the only exchange in the whole query is the final presentation
    * sort. The merge hint pins SMJ (at test SF both sides fit under the
    * broadcast threshold, which would also be exchange-free but wouldn't
    * demonstrate co-located shuffle avoidance).
    */
  def joinBucketed(s: SparkSession, dir: String): DataFrame = {
    val (oTbl, lTbl) = ensureBucketed(s, dir)
    val o = s.table(oTbl).filter(col("o_orderpriority") === "1-URGENT")
    val l = s.table(lTbl)
    o.join(l.hint("merge"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_totalprice"))
      .agg(count(lit(1)).as("n_items"),
        (sum((cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .cast("decimal(38,0)")).cast("double") / 10000.0).as("revenue"))
      .orderBy(col("o_orderkey"))
  }

  /** Oracle over the PLAIN tables — bucketing is a physical layout
    * choice and must not change the result.
    */
  val joinBucketedSql: String =
    """SELECT o_orderkey, o_totalprice, count(*) AS n_items,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0 AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY o_orderkey, o_totalprice
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------ unpivot
  /** Wide→long unpivot (melt): per-priority order aggregates flipped
    * into (priority, metric, value) rows — the inverse of
    * [[pivotEvents]], via Spark's native `unpivot` (planned as a
    * single Expand over the aggregate, no join or union of scans).
    */
  def unpivotRevenue(s: SparkSession, dir: String): DataFrame = {
    val agg = t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("double").as("n_orders"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("total_value"),
        (sum(cents(col("o_totalprice"))) / 100.0 / count(lit(1))).as("avg_value"))
    agg.unpivot(
      Array(col("o_orderpriority")),
      Array(col("n_orders"), col("total_value"), col("avg_value")),
      "metric", "value")
      .orderBy(col("o_orderpriority"), col("metric"))
  }

  val unpivotRevenueSql: String =
    """WITH a AS (SELECT o_orderpriority,
      |    CAST(count(*) AS DOUBLE) AS n_orders,
      |    sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS total_value,
      |    sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0/count(*) AS avg_value
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM a
      |UNION ALL SELECT o_orderpriority, 'total_value', total_value FROM a
      |UNION ALL SELECT o_orderpriority, 'avg_value', avg_value FROM a
      |ORDER BY o_orderpriority, metric""".stripMargin

  // ------------------------------------------------------- mode
  /** Modal value per group (each user's most frequent event type,
    * lexicographic tiebreak): grouped count + WindowGroupLimit-planned
    * row_number — two shuffles on bounded key spaces, no sort of raw
    * events.
    */
  def aggMode(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("n_events").desc, col("event_type"))
    events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("modal_type"), col("n_events"))
      .orderBy(col("user_id"))
  }

  val aggModeSql: String =
    """SELECT user_id, event_type AS modal_type, n_events FROM (
      |  SELECT user_id, event_type, count(*) AS n_events,
      |    row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rn
      |  FROM events GROUP BY user_id, event_type)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------- retention
  /** Corpora whose date-partitioned events twin is already written
    * (same stale-safety contract as the bucketed tables). This twin is
    * plain FILES read back by path — no catalog entry — so unlike
    * [[ensureBucketed]] it survives a session swap; the location is
    * keyed by the corpus signature (two signatures for one dir write
    * disjoint paths) and a memo hit whose files vanished self-heals.
    */
  private val partitionedReady = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensurePartitionedEvents(s: SparkSession, dir: String): String = {
    val hconf = s.sparkContext.hadoopConfiguration
    val sig = fileSig(s, dir, "events")
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + java.lang.Long.toHexString(sig.hashCode.toLong & 0xffffffffL)
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
      s"graft_events_byday_$tag")
    val key = s"$dir|$sig"
    if (partitionedReady.containsKey(key) && !loc.getFileSystem(hconf).exists(loc))
      partitionedReady.remove(key)
    partitionedReady.computeIfAbsent(key, _ => {
      loc.getFileSystem(hconf).delete(loc, true)
      Tables.writePartitioned(
        events(s, dir).withColumn("event_date", to_date(col("ts"))),
        loc.toString, "event_date")
      tag
    })
    loc.toString
  }

  /** Single-day aggregate over DATE-PARTITIONED events: the partition
    * predicate is resolved against directory metadata (PartitionFilters
    * in the scan — plan-asserted), so 29 of 30 day-partitions are never
    * opened. This is the reference's per-month array-job fan-out
    * (/root/reference/src/awsbatch-mapreduce/Implementation.cs:17-80)
    * re-expressed as a storage-layout property: at 100 TB the month
    * loop becomes partition pruning on one logical table.
    */
  def scanPartitioned(s: SparkSession, dir: String): DataFrame = {
    val path = ensurePartitionedEvents(s, dir)
    s.read.parquet(path)
      .filter(col("event_date") === lit("2024-01-15").cast("date"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Oracle over the PLAIN events table — partitioning is layout, not
    * semantics. Session TZ is UTC, so to_date and CAST(ts AS DATE)
    * agree.
    */
  val scanPartitionedSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
      |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------- q6
  /** Star-join over the date-partitioned events layout where the day
    * set is NOT known until runtime: the "hot days" dim (top-3 busiest
    * days) is computed, broadcast, and — via Spark's dynamic partition
    * pruning — REUSED as a partition filter on the fact scan, so only
    * 3 of the ~90 day partitions are read. [[scanPartitioned]] shows
    * static pruning (literal predicate); this is the runtime
    * equivalent every star-schema query at 100 TB depends on, where
    * the pruning predicate comes out of a dim-side subquery the
    * optimizer cannot constant-fold. Plan-asserted: the fact scan's
    * PartitionFilters carries a dynamicpruningexpression.
    */
  def scanDpp(s: SparkSession, dir: String): DataFrame = {
    val path = ensurePartitionedEvents(s, dir)
    val fact = s.read.parquet(path)
    // The day_n > 0 filter is semantically vacuous (grouped counts are
    // >= 1) but REQUIRED structurally: PartitionPruning only injects
    // the dynamic filter when the dim side carries a selective Filter
    // node — an aggregate + limit alone doesn't qualify.
    val dim = events(s, dir)
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("day_n"))
      .filter(col("day_n") > 0L)
      .orderBy(col("day_n").desc, col("event_date")).limit(3)
    fact.join(broadcast(dim), Seq("event_date"))
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_events"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .select(fmtDay(col("event_date")).as("day"), col("n_events"),
        col("sum_value"))
      .orderBy(col("day"))
  }

  val scanDppSql: String =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS day_n
      |  FROM events GROUP BY 1 ORDER BY day_n DESC, day LIMIT 3)
      |SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |  count(*) AS n_events,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value
      |FROM events WHERE CAST(ts AS DATE) IN (SELECT day FROM d)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------ skew helper
  /** Two-phase salted aggregation for skewed keys: spray each hot key
    * across `salt` partial groups, combine, then merge the partials;
    * the salt bounds any reducer's share to ~1/salt of the hot key.
    *
    * Honest scope (r5, measured via graft.DebugSkew): for ALGEBRAIC
    * aggregates (sum/count/min/max/avg) Spark's map-side partial
    * aggregation already neutralizes key skew — a hot key reaches the
    * reducer as at most one partial row per map task — so there this
    * shape is belt-and-suspenders, not a fix. Salting's real niche is
    * HOLISTIC aggregation state (collect_list, exact-distinct or
    * percentile buffers) where the per-key state itself is the
    * bottleneck. Skewed JOINS are AQE skew-join's job — but note the
    * DebugSkew finding: the skewed side must reach the join as
    * Sort(ShuffleStage); an aggregate between them disables the rule.
    */
  def saltedAgg(df: DataFrame, key: Column, value: Column, salt: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .withColumn("s", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy(col("k"), col("s")).agg(sum(col("v")).as("partial"), count(lit(1)).as("pn"))
      .groupBy(col("k")).agg(sum(col("partial")).as("sum_v"), sum(col("pn")).as("n"))

  /** Registered face of [[saltedAgg]]: per-user event-value totals via
    * the two-phase salted shape, so the skew story is plan-visible (two
    * HashAggregate pairs, first keyed (k, salt)) and oracle-checked —
    * the salted partials must recombine to exactly the plain GROUP BY.
    * Values route through integer cents, so the recombination is exact
    * regardless of how the salt splits a key.
    */
  def aggSalted(s: SparkSession, dir: String): DataFrame =
    saltedAgg(events(s, dir), col("user_id"), cents(col("value")), 16)
      .select(col("k").as("user_id"), (col("sum_v") / 100.0).as("sum_value"), col("n"))
      .orderBy(col("user_id"))

  val aggSaltedSql: String =
    """SELECT user_id, sum(CAST(round(value*100) AS BIGINT))/100.0 AS sum_value,
      |  count(*) AS n
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ----------------------------------------------------------- registry
  // -------------------------------------------------- anomaly z-score
  /** Deliberately hot-keyed join, salted: 70 % of events collapse onto
    * one join key (the power-law user every real event stream has),
    * then join a per-key dim. The dim side is replicated × 8 salts and
    * the fact side picks its deterministic salt (event_id mod 8), so
    * the hot key's rows spread across 8 reducers instead of one
    * straggler task owning 70 % of the data. `shuffle_hash` hint keeps
    * the demo an actual shuffled join at test SF (a 408-row dim would
    * otherwise broadcast — which IS the right first answer when the
    * dim fits in memory).
    *
    * == Scale design ==
    * Salting is the no-AQE fallback for big-big skewed joins; the
    * measured alternative (DebugSkew, SCALING.md) is AQE's
    * OptimizeSkewedJoin splitting the hot partition for a 2.67×
    * speedup — but only when the join children are bare
    * Sort(ShuffleStage) shapes and the payload doesn't compress the
    * map-output stats below the skew threshold (SURVEY §8d). The
    * salt column costs ×8 dim replication (dim rows are O(keys),
    * negligible) and buys per-reducer balance no matter what the
    * stats say.
    */
  def joinSkewSalted(s: SparkSession, dir: String): DataFrame = {
    val SALTS = 8
    val e = events(s, dir).select(
      when(pmod(col("event_id"), lit(10)) < 7, lit(-1L))
        .otherwise(pmod(col("user_id"), lit(50))).as("join_key"),
      pmod(col("event_id"), lit(SALTS)).as("salt"),
      cents(col("value")).as("vc"))
    val dim = s.range(-1, 50).select(col("id").as("join_key"),
      concat(lit("tier"), pmod(col("id") + 50, lit(4))).as("tier"))
    val salted = dim.crossJoin(s.range(SALTS).select(col("id").as("salt")))
    e.join(salted.hint("shuffle_hash"), Seq("join_key", "salt"))
      .groupBy(col("join_key"), col("tier"))
      .agg(count(lit(1)).as("n_events"), (sum(col("vc")) / 100.0).as("sum_value"))
      .orderBy(col("join_key"))
  }

  /** Oracle: the salt is an implementation detail — plain key join. */
  val joinSkewSaltedSql: String =
    """WITH e AS (SELECT CASE WHEN event_id % 10 < 7 THEN -1
      |      ELSE user_id % 50 END AS join_key,
      |    CAST(round(value*100) AS BIGINT) AS vc FROM events),
      |d AS (SELECT unnest(range(-1, 50)) AS join_key),
      |d2 AS (SELECT join_key,
      |    'tier' || CAST((join_key + 50) % 4 AS VARCHAR) AS tier FROM d)
      |SELECT e.join_key, d2.tier, count(*) AS n_events,
      |  CAST(sum(vc) AS BIGINT) / 100.0 AS sum_value
      |FROM e JOIN d2 USING (join_key)
      |GROUP BY e.join_key, d2.tier ORDER BY e.join_key""".stripMargin

  // ------------------------------------------------- session path analysis
  /** The no-salt twin of [[joinSkewSalted]]: the same power-law fact
    * (70 % of events collapse onto join key 0) joined to a bare
    * customer-keyed dim, shaped so AQE's OptimizeSkewedJoin — not a
    * hand salt — owns the skew at scale. The two DebugSkew-measured
    * preconditions are baked in: the merge hint pins a sort-merge join
    * whose children reach the exchange as bare Sort(ShuffleStage)
    * shapes (no aggregate between scan and join on EITHER side — a
    * groupBy-built dim silently disables the rule), so when a hot
    * partition exceeds the skew threshold the runtime splits it into
    * per-split tasks (measured 2.67× on the 10× replica, SCALING.md).
    * At oracle/bench SF the partitions sit below every threshold and
    * the plan is a plain SMJ — correctness is threshold-independent,
    * which is the point: the SAME declarative query self-heals at
    * 100 TB with zero query changes.
    */
  def joinSkewAqe(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(
      when(pmod(col("event_id"), lit(10)) < 7, lit(0L))
        .otherwise(pmod(col("user_id"), lit(1000))).as("k"),
      cents(col("value")).as("vc"))
    val dim = t(s, dir, "customer")
      .select(col("c_custkey").as("k"), cents(col("c_acctbal")).as("bal"))
    e.hint("merge").join(dim, Seq("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_events"), (sum(col("vc")) / 100.0).as("sum_value"),
        (max(col("bal")) / 100.0).as("acctbal"))
      .orderBy(col("k"))
  }

  val joinSkewAqeSql: String =
    """WITH e AS (SELECT CASE WHEN event_id % 10 < 7 THEN 0
      |      ELSE user_id % 1000 END AS k,
      |    CAST(round(value*100) AS BIGINT) AS vc FROM events),
      |d AS (SELECT c_custkey AS k,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal FROM customer)
      |SELECT e.k, count(*) AS n_events,
      |  CAST(sum(vc) AS BIGINT)/100.0 AS sum_value,
      |  CAST(max(bal) AS BIGINT)/100.0 AS acctbal
      |FROM e JOIN d USING (k)
      |GROUP BY e.k ORDER BY e.k""".stripMargin

  // ----------------------------------------------- count-min sketch
  /** Heavy hitters via a count-min sketch, exact-verified: a 4×1024
    * CMS over event user_ids, then the top-20 users by exact count with
    * their CMS estimate alongside (est ≥ exact always; est_err is the
    * collision overcount). Unlike the HLL/quantile sketches, CMS is
    * FULLY deterministic — the cell counts are plain grouped counts
    * under fixed affine hashes — so the whole sketch replays in the
    * DuckDB oracle and this query is hash-verified end to end.
    *
    * == Scale design ==
    * The sketch state is 4 lanes × 1024 cells regardless of key
    * cardinality: after map-side combine the shuffle carries ≤4096
    * rows per lane-cell, and the estimate join BROADCASTS the whole
    * sketch. That is the point of CMS at 100 TB — frequency estimates
    * with state that never grows with the key space, mergeable across
    * partitions/batches by cell-wise addition. (The exact top-20 here
    * is the verification harness, not the production path; at scale
    * candidates come from per-partition local top-k, re-estimated
    * against the broadcast sketch.)
    */
  /** CMS geometry shared with the streaming face: 4 affine lanes over
    * a 1024-cell width, mod the Mersenne prime 2^31−1.
    */
  private[graft] val cmsLanes = Seq((1103515245L, 12345L),
    (1140671485L, 12820163L), (214013L, 2531011L), (69069L, 1L))
  private[graft] def cmsCell(i: Int, u: Column): Column =
    pmod(pmod(u * lit(cmsLanes(i)._1) + lit(cmsLanes(i)._2),
      lit(2147483647L)), lit(1024L))

  def aggHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val lanes = cmsLanes
    def cellOf(i: Int, u: Column): Column = cmsCell(i, u)
    val e = events(s, dir).select(col("user_id").as("u"))
    val cms = e.select(explode(array(lanes.indices.map(i =>
        struct(lit(i.toLong).as("lane"), cellOf(i, col("u")).as("cell"))): _*))
        .as("lc"))
      .select(col("lc.lane").as("lane"), col("lc.cell").as("cell"))
      .groupBy(col("lane"), col("cell")).agg(count(lit(1)).as("c"))
    val top = e.groupBy(col("u")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("u")).limit(20)
    top.select(col("u"), col("n_exact"), explode(array(lanes.indices.map(i =>
        struct(lit(i.toLong).as("lane"), cellOf(i, col("u")).as("cell"))): _*))
        .as("lc"))
      .select(col("u"), col("n_exact"),
        col("lc.lane").as("lane"), col("lc.cell").as("cell"))
      .join(broadcast(cms), Seq("lane", "cell"))
      .groupBy(col("u"), col("n_exact")).agg(min(col("c")).as("n_est"))
      .select(col("u").as("user_id"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("est_err"))
      .orderBy(col("n_exact").desc, col("user_id"))
  }

  val aggHeavyHittersSql: String =
    """WITH e AS (SELECT user_id AS u FROM events),
      |l AS (SELECT * FROM (VALUES (0, 1103515245, 12345),
      |    (1, 1140671485, 12820163), (2, 214013, 2531011),
      |    (3, 69069, 1)) AS t(lane, a, b)),
      |cells AS (SELECT lane, ((a*u + b) % 2147483647) % 1024 AS cell,
      |    count(*) AS c
      |  FROM e CROSS JOIN l GROUP BY 1, 2),
      |top AS (SELECT u, count(*) AS n_exact FROM e GROUP BY u
      |  ORDER BY n_exact DESC, u LIMIT 20)
      |SELECT t.u AS user_id, t.n_exact, CAST(min(c.c) AS BIGINT) AS n_est,
      |  CAST(min(c.c) - t.n_exact AS BIGINT) AS est_err
      |FROM top t CROSS JOIN l
      |JOIN cells c ON c.lane = l.lane
      |  AND c.cell = ((l.a*t.u + l.b) % 2147483647) % 1024
      |GROUP BY t.u, t.n_exact
      |ORDER BY n_exact DESC, user_id""".stripMargin

  /** Sketch ALGEBRA on the count-min cells — the union symmetry CMS
    * lacked (HLL and the grid quantile both have hash-checked merge
    * faces): the two drift epochs' 4×1024 sketches (the 2024-01-16
    * cut shared with [[aggQuantileUnion]]) merge by CELL-WISE
    * ADDITION — counting registers merge exactly — and the merged
    * sketch must agree with a sketch built DIRECTLY over the union.
    * Certified by estimating the SAME top-5 exact-hot users under all
    * four faces ('ref', 'cur', 'merged', 'direct') and hash-checking
    * the table: merged ≡ direct row-for-row is the algebra; n_est ≥
    * n_exact per face is the CMS one-sided contract (est_err = the
    * collision overcount, per-epoch errors visible separately).
    *
    * == Scale design ==
    * ONE scan folds events map-side onto the O(users) per-user
    * (total, ref) count relation (stableCheckpointed); both epoch
    * sketches are WEIGHTED folds of that relation onto the fixed
    * 4×1024 cells, and the top-5 exact leg rides it too. The direct
    * face deliberately re-scans raw events — it exists purely as the
    * independent cross-check target (the [[aggQuantileUnion]]
    * pattern). Merging a backfill∪live pair at 100 TB costs the
    * 4096-row register table, never a re-scan.
    */
  def aggCountMinUnion(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val lanes = cmsLanes
    def laneCells(u: Column): Column = explode(array(lanes.indices.map(i =>
      struct(lit(i.toLong).as("lane"), cmsCell(i, u).as("cell"))): _*))
    val ue = events(s, dir)
      .select(col("user_id").as("u"), (col("ts") < cut).cast("long").as("is_ref"))
      .groupBy(col("u"))
      .agg(count(lit(1)).as("n_all"), sum(col("is_ref")).as("n_ref"))
      .stableCheckpoint()
    val sk = ue.select(col("n_all"), col("n_ref"), laneCells(col("u")).as("lc"))
      .select(col("lc.lane").as("lane"), col("lc.cell").as("cell"),
        col("n_all"), col("n_ref"))
      .groupBy(col("lane"), col("cell"))
      .agg(sum(col("n_ref")).as("ref_c"),
        sum(col("n_all") - col("n_ref")).as("cur_c"))
    val direct = events(s, dir).select(col("user_id").as("u"))
      .select(laneCells(col("u")).as("lc"))
      .select(col("lc.lane").as("lane"), col("lc.cell").as("cell"))
      .groupBy(col("lane"), col("cell")).agg(count(lit(1)).as("c"))
      .select(col("lane"), col("cell"), lit("direct").as("face"), col("c"))
    val stacked = sk.select(col("lane"), col("cell"), expr(
        "stack(3, 'ref', ref_c, 'cur', cur_c, 'merged', ref_c + cur_c) AS (face, c)"))
      .select(col("lane"), col("cell"), col("face"), col("c"))
      .union(direct)
      .select(col("lane").as("slane"), col("cell").as("scell"),
        col("face").as("sface"), col("c"))
    val top = ue.orderBy(col("n_all").desc, col("u")).limit(5)
    val faces = top.select(col("u"), expr(
      "stack(4, 'ref', n_ref, 'cur', n_all - n_ref," +
        " 'merged', n_all, 'direct', n_all) AS (face, n_exact)"))
    faces.select(col("u"), col("face"), col("n_exact"), laneCells(col("u")).as("lc"))
      .select(col("u"), col("face"), col("n_exact"),
        col("lc.lane").as("lane"), col("lc.cell").as("cell"))
      .join(broadcast(stacked), col("slane") === col("lane") &&
        col("scell") === col("cell") && col("sface") === col("face"))
      .groupBy(col("u"), col("face"), col("n_exact"))
      .agg(min(col("c")).as("n_est"))
      .select(col("face"), col("u").as("user_id"), col("n_exact"),
        col("n_est"), (col("n_est") - col("n_exact")).as("est_err"))
      .orderBy(col("user_id"), col("face"))
  }

  /** DuckDB twin: same lanes, same epoch cut, same stacked faces. */
  val aggCountMinUnionSql: String =
    """WITH e AS (SELECT user_id AS u,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref
      |  FROM events),
      |ue AS (SELECT u, count(*) AS n_all, CAST(sum(is_ref) AS BIGINT) AS n_ref
      |  FROM e GROUP BY u),
      |l AS (SELECT * FROM (VALUES (0, 1103515245, 12345),
      |    (1, 1140671485, 12820163), (2, 214013, 2531011),
      |    (3, 69069, 1)) AS t(lane, a, b)),
      |sk AS (SELECT lane, ((a*u + b) % 2147483647) % 1024 AS cell,
      |    CAST(sum(n_ref) AS BIGINT) AS ref_c,
      |    CAST(sum(n_all - n_ref) AS BIGINT) AS cur_c
      |  FROM ue CROSS JOIN l GROUP BY 1, 2),
      |stacked AS (
      |  SELECT lane, cell, 'ref' AS face, ref_c AS c FROM sk
      |  UNION ALL SELECT lane, cell, 'cur', cur_c FROM sk
      |  UNION ALL SELECT lane, cell, 'merged', ref_c + cur_c FROM sk
      |  UNION ALL SELECT lane, ((a*u + b) % 2147483647) % 1024, 'direct', count(*)
      |    FROM e CROSS JOIN l GROUP BY 1, 2),
      |top AS (SELECT u, n_all, n_ref FROM ue ORDER BY n_all DESC, u LIMIT 5),
      |faces AS (
      |  SELECT u, 'ref' AS face, n_ref AS n_exact FROM top
      |  UNION ALL SELECT u, 'cur', n_all - n_ref FROM top
      |  UNION ALL SELECT u, 'merged', n_all FROM top
      |  UNION ALL SELECT u, 'direct', n_all FROM top)
      |SELECT f.face, f.u AS user_id, f.n_exact,
      |  CAST(min(st.c) AS BIGINT) AS n_est,
      |  CAST(min(st.c) - f.n_exact AS BIGINT) AS est_err
      |FROM faces f CROSS JOIN l
      |JOIN stacked st ON st.lane = l.lane AND st.face = f.face
      |  AND st.cell = ((l.a*f.u + l.b) % 2147483647) % 1024
      |GROUP BY 1, 2, 3
      |ORDER BY user_id, f.face""".stripMargin

  /** Width tuning curve for the count-min sketch (r14 wave 33 — the
    * third and last sketch family gains its curve face, completing
    * the curve symmetry: [[aggHllCurve]] reads 1/√m, the quantile
    * curve reads 1/W, this reads CMS's ε = e/w collision law): the
    * SAME per-user count relation sketched at widths
    * w ∈ {64, 256, 1024, 4096} cells per lane, the top-5 exact-hot
    * users re-estimated under each width — est_err (the collision
    * overcount, always ≥ 0) shrinks roughly ×4 per width step until
    * it floors at 0, and the production 1024 is chosen where the
    * curve crosses the memory budget, not assumed.
    *
    * == Scale design ==
    * ONE scan folds map-side onto the checkpointed O(users) count
    * relation; all four sketches are folds of THAT relation (4 widths
    * × 4 lanes of cells, ≤4·(64+256+1024+4096) register rows total);
    * the probe joins broadcast the register table.
    */
  def aggCountMinCurve(s: SparkSession, dir: String): DataFrame = {
    val lanes = cmsLanes
    def cellAt(i: Int, u: Column, w: Column): Column =
      pmod(pmod(u * lit(lanes(i)._1) + lit(lanes(i)._2), lit(2147483647L)), w)
    val ue = events(s, dir).select(col("user_id").as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("n"))
      .stableCheckpoint()
    val ws = s.createDataFrame(Seq(64L, 256L, 1024L, 4096L).map(Tuple1.apply)).toDF("w")
    val cells = ue.crossJoin(broadcast(ws))
      .select(col("w"), col("n"), explode(array(lanes.indices.map(i =>
        struct(lit(i.toLong).as("lane"), cellAt(i, col("u"), col("w")).as("cell"))): _*))
        .as("lc"))
      .select(col("w"), col("lc.lane").as("lane"), col("lc.cell").as("cell"), col("n"))
      .groupBy(col("w"), col("lane"), col("cell")).agg(sum(col("n")).as("c"))
      .select(col("w").as("sw"), col("lane").as("slane"),
        col("cell").as("scell"), col("c"))
    val top = ue.orderBy(col("n").desc, col("u")).limit(5)
    top.crossJoin(broadcast(ws))
      .select(col("u"), col("n").as("n_exact"), col("w"),
        explode(array(lanes.indices.map(i =>
          struct(lit(i.toLong).as("lane"), cellAt(i, col("u"), col("w")).as("cell"))): _*))
          .as("lc"))
      .select(col("u"), col("n_exact"), col("w"),
        col("lc.lane").as("lane"), col("lc.cell").as("cell"))
      .join(broadcast(cells), col("sw") === col("w") &&
        col("slane") === col("lane") && col("scell") === col("cell"))
      .groupBy(col("w"), col("u"), col("n_exact"))
      .agg(min(col("c")).as("n_est"))
      .select(col("w").as("width"), col("u").as("user_id"), col("n_exact"),
        col("n_est"), (col("n_est") - col("n_exact")).as("est_err"))
      .orderBy(col("width"), col("user_id"))
  }

  /** DuckDB twin: same lanes, same width fan-out over the user fold. */
  val aggCountMinCurveSql: String =
    """WITH ue AS (SELECT user_id AS u, count(*) AS n FROM events GROUP BY 1),
      |ws AS (SELECT unnest(CAST([64,256,1024,4096] AS BIGINT[])) AS w),
      |l AS (SELECT * FROM (VALUES (0, 1103515245, 12345),
      |    (1, 1140671485, 12820163), (2, 214013, 2531011),
      |    (3, 69069, 1)) AS t(lane, a, b)),
      |cells AS (SELECT w, lane, ((a*u + b) % 2147483647) % w AS cell,
      |    CAST(sum(n) AS BIGINT) AS c
      |  FROM ue CROSS JOIN ws CROSS JOIN l GROUP BY 1, 2, 3),
      |top AS (SELECT u, n FROM ue ORDER BY n DESC, u LIMIT 5)
      |SELECT ws.w AS width, t.u AS user_id, CAST(t.n AS BIGINT) AS n_exact,
      |  CAST(min(c.c) AS BIGINT) AS n_est,
      |  CAST(min(c.c) - t.n AS BIGINT) AS est_err
      |FROM top t CROSS JOIN ws CROSS JOIN l
      |JOIN cells c ON c.w = ws.w AND c.lane = l.lane
      |  AND c.cell = ((l.a*t.u + l.b) % 2147483647) % ws.w
      |GROUP BY ws.w, t.u, t.n
      |ORDER BY width, user_id""".stripMargin

  // ------------------------------------------------------------ skyline
  /** Pareto frontier (skyline) of parts under (minimize price, maximize
    * size): a part survives iff no other part is at-most-as-expensive
    * AND at-least-as-large with one strict. The DECLARATIVE definition
    * is a quadratic NOT EXISTS — that is exactly what the DuckDB oracle
    * runs — but the registered plan is the O(n log n) sort-prune
    * formulation: collapse to one max-size row per price level
    * (map-side combinable groupBy), take a running prefix-max of size
    * over ascending price on that collapsed relation, and keep levels
    * whose max strictly beats every cheaper level; parts on a kept
    * level at exactly the level max are the skyline. Price rides exact
    * integer cents so no float boundary can flip a level between
    * engines.
    *
    * == Scale design ==
    * The only full-data operations are the per-level groupBy (shuffle
    * bounded by DISTINCT PRICE LEVELS, not rows) and the broadcast-join
    * back. The prefix-max window runs on the collapsed O(levels)
    * relation — a single small partition by construction (cent-priced
    * retail domain), not a window over the corpus. If the level
    * relation itself ever outgrew one partition, the same prefix-max
    * decomposes into a range-partitioned scan + per-range offset pass;
    * the quadratic anti-join NEVER runs on the engine side.
    */
  def skylinePareto(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .select(col("p_partkey"), cents(col("p_retailprice")).as("price_cents"),
        col("p_size"))
    val lvl = p.groupBy(col("price_cents")).agg(max(col("p_size")).as("lvl_max"))
    val wPrev = Window.orderBy(col("price_cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = lvl
      .withColumn("prev_max", max(col("lvl_max")).over(wPrev))
      .filter(col("prev_max").isNull || col("lvl_max") > col("prev_max"))
      .select(col("price_cents"), col("lvl_max"))
    p.join(broadcast(frontier), Seq("price_cents"))
      .filter(col("p_size") === col("lvl_max"))
      .select(col("p_partkey"), col("price_cents"), col("p_size"))
      .orderBy(col("price_cents"), col("p_partkey"))
  }

  /** DuckDB oracle: the textbook quadratic NOT EXISTS dominance test —
    * a genuinely different formulation than the engine's sort-prune
    * plan, so agreement checks the algorithm, not the transcription.
    */
  val skylineParetoSql: String =
    """WITH p AS (SELECT p_partkey,
      |    CAST(round(p_retailprice*100) AS BIGINT) AS price_cents, p_size
      |  FROM part)
      |SELECT p_partkey, price_cents, p_size FROM p a
      |WHERE NOT EXISTS (SELECT 1 FROM p b
      |  WHERE (b.price_cents < a.price_cents AND b.p_size >= a.p_size)
      |     OR (b.price_cents <= a.price_cents AND b.p_size > a.p_size))
      |ORDER BY price_cents, p_partkey""".stripMargin

  // ----------------------------------------------- session co-occurrence
  /** (register index, rank) pair for one user id — shared between the
    * batch replay and [[graft.streaming.EventStreams.hllRegisterStream]]
    * so the two sketches are the same function of the data. h ≥ 0, so
    * `% 64` and `>> 6` are the mod/div pair exactly.
    */
  private[graft] def hllRegister(u: Column): Column = {
    val h = (lit(1103515245L) * u + 12345L) % 2147483647L
    struct((h % 64).as("j"),
      (lit(26) - length(bin(shiftright(h, 6) + 1))).cast("long").as("rho"))
  }

  def aggHllReplay(s: SparkSession, dir: String): DataFrame = {
    val u = events(s, dir).select(col("user_id").as("u")).distinct()
    val r = u.select(hllRegister(col("u")).as("r"))
      .select(col("r.j").as("j"), col("r.rho").as("rho"))
    val m = r.groupBy(col("j")).agg(max(col("rho")).as("mj"))
    val regs = s.range(64).toDF("j").join(m, Seq("j"), "left_outer")
      .select(coalesce(col("mj"), lit(0L)).as("mj"))
    val sums = regs.agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(26 - mj AS INT))")).as("s"),
      sum(when(col("mj") === 0, 1L).otherwise(0L)).as("v_zero"))
    val exact = events(s, dir).agg(countDistinct(col("user_id")).as("n_exact"))
    exact.crossJoin(broadcast(sums))
      .select(col("n_exact"), col("v_zero"),
        expr("(709 * 4096 * shiftleft(CAST(1 AS BIGINT), 26)) div s").as("est_milli"))
  }

  val aggHllReplaySql: String =
    """WITH u AS (SELECT DISTINCT user_id AS u FROM events),
      |h AS (SELECT ((1103515245*u + 12345) % 2147483647) AS h FROM u),
      |r AS (SELECT h % 64 AS j, 26 - length(bin((h // 64) + 1)) AS rho FROM h),
      |m AS (SELECT j, max(rho) AS mj FROM r GROUP BY 1),
      |regs AS (SELECT t.j, COALESCE(m.mj, 0) AS mj
      |  FROM range(0, 64) t(j) LEFT JOIN m ON m.j = t.j),
      |s AS (SELECT CAST(sum(CAST(1 AS BIGINT) << CAST(26 - mj AS INT)) AS BIGINT) AS s,
      |    CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
      |  FROM regs)
      |SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_exact,
      |  v_zero, (709 * 4096 * (CAST(1 AS BIGINT) << 26)) // s AS est_milli
      |FROM s""".stripMargin

  /** Grouped twin of [[aggHllReplay]]: one 64-register sketch PER
    * EVENT TYPE — the per-segment distinct-count shape production
    * pipelines actually run (state = 64 longs × |alphabet|, mergeable
    * per group). Registers densify via an alphabet × range(64) frame so
    * empty registers count as rank 0 in every group's harmonic mean;
    * the estimate stays one exact integer division per group.
    */
  def aggHllGrouped(s: SparkSession, dir: String): DataFrame = {
    val r = events(s, dir).select(col("event_type"), col("user_id").as("u")).distinct()
      .select(col("event_type"), hllRegister(col("u")).as("r"))
      .select(col("event_type"), col("r.j").as("j"), col("r.rho").as("rho"))
    val m = r.groupBy(col("event_type"), col("j")).agg(max(col("rho")).as("mj"))
    val regs = m.select(col("event_type")).distinct()
      .crossJoin(s.range(64).toDF("j"))
      .join(m, Seq("event_type", "j"), "left_outer")
      .select(col("event_type"), coalesce(col("mj"), lit(0L)).as("mj"))
    val sums = regs.groupBy(col("event_type"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(26 - mj AS INT))")).as("s"))
    events(s, dir).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .join(broadcast(sums), "event_type")
      .select(col("event_type"), col("n_exact"),
        expr("(709 * 4096 * shiftleft(CAST(1 AS BIGINT), 26)) div s").as("est_milli"))
      .orderBy(col("event_type"))
  }

  val aggHllGroupedSql: String =
    """WITH u AS (SELECT DISTINCT event_type, user_id AS u FROM events),
      |h AS (SELECT event_type, ((1103515245*u + 12345) % 2147483647) AS h FROM u),
      |r AS (SELECT event_type, h % 64 AS j,
      |    26 - length(bin((h // 64) + 1)) AS rho FROM h),
      |m AS (SELECT event_type, j, max(rho) AS mj FROM r GROUP BY 1, 2),
      |ty AS (SELECT DISTINCT event_type FROM m),
      |regs AS (SELECT ty.event_type, t.j, COALESCE(m.mj, 0) AS mj
      |  FROM ty CROSS JOIN range(0, 64) t(j)
      |  LEFT JOIN m ON m.event_type = ty.event_type AND m.j = t.j),
      |s AS (SELECT event_type,
      |    CAST(sum(CAST(1 AS BIGINT) << CAST(26 - mj AS INT)) AS BIGINT) AS s
      |  FROM regs GROUP BY 1),
      |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
      |  FROM events GROUP BY 1)
      |SELECT ex.event_type, ex.n_exact,
      |  (709 * 4096 * (CAST(1 AS BIGINT) << 26)) // s.s AS est_milli
      |FROM ex JOIN s ON s.event_type = ex.event_type
      |ORDER BY ex.event_type""".stripMargin

  /** Register-count tuning curve for the replayable integer HLL — the
    * sketch family's size/accuracy trade made an oracle-checked
    * artifact (the dedup_lsh_curve / ann_recall_curve move applied to
    * sketches): the SAME distinct-user relation sketched at
    * m ∈ {16, 64, 256} registers with the matched bit budget
    * (r = 31 − log₂ m + 1 leading-bit range) and the standard α_m
    * milli-constants (673/709/712), each estimate compared against the
    * exact count in exact integer ppm. The emitted table is where the
    * 1/√m error law is read off before choosing production register
    * width — and the m=64 row reproduces [[aggHllReplay]]'s estimate
    * by construction (spec-pinned).
    *
    * == Scale design ==
    * ONE distinct pass; the 3-config fan-out is a broadcast cross
    * join on the distinct-user relation folding map-side onto
    * O(Σm = 336) register rows; estimates are scalar divisions.
    */
  def aggHllCurve(s: SparkSession, dir: String): DataFrame = {
    val cfg = s.createDataFrame(Seq((16L, 673L, 28), (64L, 709L, 26), (256L, 712L, 24)))
      .toDF("m", "alpha_milli", "r")
    val u = events(s, dir).select(col("user_id").as("u")).distinct()
    val h = (lit(1103515245L) * col("u") + 12345L) % 2147483647L
    val reg = u.crossJoin(broadcast(cfg))
      .select(col("m"), col("alpha_milli"), col("r"), h.as("h"))
      .select(col("m"), col("alpha_milli"), col("r"),
        expr("h % m").as("j"),
        expr("cast(r - length(bin((h div m) + 1)) as bigint)").as("rho"))
      .groupBy(col("m"), col("alpha_milli"), col("r"), col("j"))
      .agg(max(col("rho")).as("mj"))
    val grid = cfg.select(col("m"), col("alpha_milli"), col("r"),
        explode(sequence(lit(0L), col("m") - 1)).as("j"))
      .join(reg, Seq("m", "alpha_milli", "r", "j"), "left_outer")
      .select(col("m"), col("alpha_milli"), col("r"),
        coalesce(col("mj"), lit(0L)).as("mj"))
    val sums = grid.groupBy(col("m"), col("alpha_milli"), col("r"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(r - mj AS INT))")).as("s"))
    val exact = events(s, dir).agg(countDistinct(col("user_id")).as("n_exact"))
    sums.crossJoin(broadcast(exact))
      .select(col("m"), col("n_exact"),
        expr("(alpha_milli * m * m * shiftleft(CAST(1 AS BIGINT), CAST(r AS INT))) div s")
          .as("est_milli"))
      .withColumn("err_ppm",
        expr("abs(est_milli - 1000 * n_exact) * 1000 div n_exact"))
      .orderBy(col("m"))
  }

  /** DuckDB twin: same LCG hash, per-m register lanes, matched bit
    * budgets and α constants. */
  val aggHllCurveSql: String =
    """WITH cfg AS (SELECT CAST(m AS BIGINT) AS m,
      |    CAST(alpha_milli AS BIGINT) AS alpha_milli, CAST(r AS BIGINT) AS r
      |  FROM (VALUES (16, 673, 28), (64, 709, 26), (256, 712, 24)) t(m, alpha_milli, r)),
      |u AS (SELECT DISTINCT user_id AS u FROM events),
      |h AS (SELECT ((1103515245*u + 12345) % 2147483647) AS h FROM u),
      |rr AS (SELECT m, alpha_milli, r, h % m AS j,
      |    r - length(bin((h // m) + 1)) AS rho FROM h CROSS JOIN cfg),
      |mm AS (SELECT m, j, max(rho) AS mj FROM rr GROUP BY 1, 2),
      |grid AS (SELECT m, alpha_milli, r, unnest(range(0, m)) AS j FROM cfg),
      |regs AS (SELECT g.m, g.alpha_milli, g.r, COALESCE(mm.mj, 0) AS mj
      |  FROM grid g LEFT JOIN mm ON mm.m = g.m AND mm.j = g.j),
      |s AS (SELECT m, alpha_milli, r,
      |    CAST(sum(CAST(1 AS BIGINT) << CAST(r - mj AS INT)) AS BIGINT) AS s
      |  FROM regs GROUP BY 1, 2, 3),
      |e AS (SELECT count(DISTINCT user_id) AS n_exact FROM events)
      |SELECT m, n_exact,
      |  (alpha_milli * m * m * (CAST(1 AS BIGINT) << CAST(r AS INT))) // s AS est_milli,
      |  abs((alpha_milli * m * m * (CAST(1 AS BIGINT) << CAST(r AS INT))) // s
      |    - 1000 * n_exact) * 1000 // n_exact AS err_ppm
      |FROM s CROSS JOIN e ORDER BY m""".stripMargin

  /** Sketch ALGEBRA on the per-type HLL register tables — the property
    * that justifies sketches at 100 TB made oracle-checkable: for every
    * event-type pair, the union sketch is the register-wise max of the
    * two (what a backfill∪live or cross-segment merge computes without
    * touching raw data), its estimate comes from the same exact
    * integer-division trick as [[aggHllReplay]], and the intersection
    * estimate is inclusion-exclusion on three integer estimates —
    * printed next to the EXACT pairwise user overlap for honesty.
    *
    * == Scale design ==
    * Raw data is touched exactly once (the distinct (type,user) pass);
    * everything after runs on O(types × 64) registers — merge of any
    * number of segment sketches costs register-table size, never a
    * re-scan. The exact-overlap leg shuffles the distinct relation on
    * user once; at 100 TB you'd drop that leg and keep the sketch side
    * unchanged — it exists here as the ground-truth column.
    */
  def aggHllUnion(s: SparkSession, dir: String): DataFrame = {
    val tu = events(s, dir).select(col("event_type"), col("user_id").as("u")).distinct()
    val r = tu.select(col("event_type"), hllRegister(col("u")).as("r"))
      .select(col("event_type"), col("r.j").as("j"), col("r.rho").as("rho"))
    val m = r.groupBy(col("event_type"), col("j")).agg(max(col("rho")).as("mj"))
    val regs = m.select(col("event_type")).distinct()
      .crossJoin(s.range(64).toDF("j"))
      .join(m, Seq("event_type", "j"), "left_outer")
      .select(col("event_type"), col("j"), coalesce(col("mj"), lit(0L)).as("mj"))
    def estOf(sumCol: String): Column =
      expr(s"(709 * 4096 * shiftleft(CAST(1 AS BIGINT), 26)) div $sumCol")
    val est = regs.groupBy(col("event_type"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(26 - mj AS INT))")).as("s1"))
      .select(col("event_type"), estOf("s1").as("est_milli"))
    val a = regs.select(col("event_type").as("type_a"), col("j"), col("mj").as("ma"))
    val b = regs.select(col("event_type").as("type_b"), col("j"), col("mj").as("mb"))
    val pairEst = a.join(b, "j").filter(col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), greatest(col("ma"), col("mb")).as("mu"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(26 - mu AS INT))")).as("su"))
      .select(col("type_a"), col("type_b"), estOf("su").as("est_union_milli"))
    val x = tu.select(col("event_type").as("type_a"), col("u"))
    val y = tu.select(col("event_type").as("type_b"), col("u"))
    val exact = x.join(y, "u").filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_exact_inter"))
    pairEst
      .join(broadcast(est.select(col("event_type").as("type_a"), col("est_milli").as("est_a_milli"))), "type_a")
      .join(broadcast(est.select(col("event_type").as("type_b"), col("est_milli").as("est_b_milli"))), "type_b")
      .join(exact, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("est_a_milli"), col("est_b_milli"),
        col("est_union_milli"),
        (col("est_a_milli") + col("est_b_milli") - col("est_union_milli")).as("est_inter_milli"),
        col("n_exact_inter"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val aggHllUnionSql: String =
    """WITH u AS (SELECT DISTINCT event_type, user_id AS u FROM events),
      |h AS (SELECT event_type, ((1103515245*u + 12345) % 2147483647) AS h FROM u),
      |r AS (SELECT event_type, h % 64 AS j,
      |    26 - length(bin((h // 64) + 1)) AS rho FROM h),
      |m AS (SELECT event_type, j, max(rho) AS mj FROM r GROUP BY 1, 2),
      |ty AS (SELECT DISTINCT event_type FROM m),
      |regs AS (SELECT ty.event_type, t.j, COALESCE(m.mj, 0) AS mj
      |  FROM ty CROSS JOIN range(0, 64) t(j)
      |  LEFT JOIN m ON m.event_type = ty.event_type AND m.j = t.j),
      |est AS (SELECT event_type,
      |    (709 * 4096 * (CAST(1 AS BIGINT) << 26))
      |      // CAST(sum(CAST(1 AS BIGINT) << CAST(26 - mj AS INT)) AS BIGINT) AS est_milli
      |  FROM regs GROUP BY 1),
      |pe AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    (709 * 4096 * (CAST(1 AS BIGINT) << 26))
      |      // CAST(sum(CAST(1 AS BIGINT) << CAST(26 - greatest(a.mj, b.mj) AS INT)) AS BIGINT) AS est_union_milli
      |  FROM regs a JOIN regs b ON a.j = b.j AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |ex AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*) AS n_exact_inter
      |  FROM u a JOIN u b ON a.u = b.u AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT pe.type_a, pe.type_b, ea.est_milli AS est_a_milli,
      |  eb.est_milli AS est_b_milli, pe.est_union_milli,
      |  ea.est_milli + eb.est_milli - pe.est_union_milli AS est_inter_milli,
      |  ex.n_exact_inter
      |FROM pe JOIN est ea ON ea.event_type = pe.type_a
      |JOIN est eb ON eb.event_type = pe.type_b
      |JOIN ex ON ex.type_a = pe.type_a AND ex.type_b = pe.type_b
      |ORDER BY pe.type_a, pe.type_b""".stripMargin

  // -------------------------------------------- distribution window faces
  // -------------------------------------- two-phase distributed ranking
  /** The ranking-distribution window family in one face: percent_rank
    * (exact rational (rank−1)/(n−1)), cume_dist, and quartile ntile
    * over order value within each priority class. percent_rank and
    * cume_dist are tie-stable (equal prices share a rank), but ntile
    * assigns by ROW POSITION, so its position order adds the
    * o_orderkey tiebreak — without it two engines could legally deal
    * ties into different quartiles. Both doubles are single divisions
    * of exact integers, so bit-identical cross-engine.
    *
    * == Scale design ==
    * The naive formulation (`Window.partitionBy(o_orderpriority)`)
    * caps parallelism at the 5-value priority alphabet — corpus/5 rows
    * into ONE sort task each at 100 TB. Implemented instead as the
    * two-phase range-partitioned rank ([[globalRowPos]]): P-way range
    * slices + broadcast O(P·5) offset ledger give the unique global
    * position; the tie-aware statistics are then pure arithmetic —
    * rank = min(position) over the (priority, price) tie group (a
    * fine-grained, high-cardinality window), percent_rank =
    * (rank−1)/(n−1), cume_dist = max(position)/n, quartile =
    * [[ntileAt]] bucket arithmetic. The ntile window SQL stays as the
    * oracle: same hashes, but no plan node sorts more than ~corpus/P.
    */
  def windowDistribution(s: SparkSession, dir: String): DataFrame = {
    val tp = cents(col("o_totalprice"))
    val base = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), tp.as("tpc"))
    val posd = globalRowPos(base, Seq("o_orderpriority"),
      Seq(col("tpc"), col("o_orderkey")), "__pos", "__n")
    val wTie = Window.partitionBy(col("o_orderpriority"), col("tpc"))
    posd
      .withColumn("__rnk", min(col("__pos")).over(wTie))
      .withColumn("__mx", max(col("__pos")).over(wTie))
      .select(col("o_orderkey"), col("o_orderpriority"),
        (col("tpc") / 100.0).as("totalprice"),
        when(col("__n") === 1, lit(0.0)).otherwise(
          (col("__rnk") - 1).cast("double") / (col("__n") - 1).cast("double"))
          .as("pct_rank"),
        (col("__mx").cast("double") / col("__n").cast("double")).as("cume"),
        ntileAt("__pos", "__n", 4).cast("long").as("quartile"))
      .orderBy(col("o_orderpriority"), col("tpc"), col("o_orderkey"))
  }

  val windowDistributionSql: String =
    """WITH o AS (SELECT o_orderkey, o_orderpriority,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS tpc FROM orders)
      |SELECT o_orderkey, o_orderpriority, tpc/100.0 AS totalprice,
      |  percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY tpc) AS pct_rank,
      |  cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY tpc) AS cume,
      |  CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY tpc, o_orderkey) AS BIGINT) AS quartile
      |FROM o ORDER BY o_orderpriority, tpc, o_orderkey""".stripMargin

  // ------------------------------------------------- co-occurrence drift
  /** Explicit non-hierarchical GROUPING SETS — the face neither
    * [[rollupRevenue]] nor [[cubeRevenue]] covers: two independent
    * single-column sets ((l_returnflag), (l_linestatus)) computed in one
    * pass with a grouping_id discriminator, the way a reporting layer
    * asks for two marginals without two scans. Spark 4's native
    * `Dataset.groupingSets` keeps it one declarative aggregate
    * (internally a single Expand + hash agg — one scan, map-side
    * partials, shuffle bounded by the union of group keyspaces).
    */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("revenue"),
        count(lit(1)).as("n_items"))
      .select(col("gid"), col("l_returnflag"), col("l_linestatus"),
        col("revenue"), col("n_items"))
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))

  val aggGroupingSetsSql: String =
    """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  l_returnflag, l_linestatus,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ------------------------------------------- semi-structured props
  /** Count-Min frequency sketch, the mergeable-state companion to the
    * HLL family ([[aggHllGrouped]]): d=4 hash rows × w=64 counters
    * over event user_ids, then every distinct user probed back through
    * the sketch — est = min over rows of its counter. The output
    * carries the exact count next to the estimate, and the CMS
    * guarantee (est ≥ exact, always) is visible in the overcount
    * column, which the spec asserts is non-negative everywhere.
    *
    * Hash family: the engine-portable poly_hash over "cm{r}|{user}",
    * replayed fold-for-fold by the oracle, so both engines fill
    * byte-identical counter grids.
    *
    * == Scale design ==
    * The sketch build is ONE pass with a posexplode fan-out of d=4
    * cells per row and a map-side-combinable count into O(d·w)=256
    * cells — constant state regardless of corpus size, the whole
    * point of a sketch. The probe side joins the tiny counter grid
    * BROADCAST against the per-user exact counts, so no second
    * shuffle of the event log. Counter grids from disjoint segments
    * merge by cell-wise ADD (vs the HLL register max) — the
    * streaming/backfill merge story is the same tiny fixed state.
    */
  def aggCountMin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    def ph(c: Column): Column = GraftSqlShim.column(graft.functions.StringPolyHash(
      GraftSqlShim.expression(c), GraftSqlShim.expression(lit(1000000007L))))
    val e = events(s, dir).select(col("user_id").cast("string").as("u"))
    val cells = e.select(posexplode(array((0 until 4).map(r =>
        ph(concat(lit(s"cm$r|"), col("u"))) % 64L): _*)).as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val users = events(s, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_exact"))
    users
      .select(col("user_id"), col("n_exact"),
        posexplode(array((0 until 4).map(r =>
          ph(concat(lit(s"cm$r|"), col("user_id").cast("string"))) % 64L): _*))
          .as(Seq("r", "bucket")))
      .join(broadcast(cells), Seq("r", "bucket"))
      .groupBy(col("user_id"), col("n_exact"))
      .agg(min(col("cnt")).as("est"))
      .select(col("user_id"), col("n_exact"), col("est"),
        (col("est") - col("n_exact")).as("overcount"))
      .orderBy(col("user_id"))
  }

  /** DuckDB twin: the d=4 cell fan-out is an explicit UNION ALL (the
    * oracle keeps the textbook form), the probe the same min-over-rows
    * join; poly_hash replays via the shared list_reduce fold.
    */
  val aggCountMinSql: String = {
    def phSql(prefix: String, col: String): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split('$prefix' || $col, ''), c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a * 31 + b) % 1000000007) % 64"
    val cellRows = (0 until 4).map(r =>
      s"SELECT $r AS r, ${phSql(s"cm$r|", "CAST(user_id AS VARCHAR)")} AS bucket FROM events")
      .mkString("\n  UNION ALL ")
    val probeRows = (0 until 4).map(r =>
      s"SELECT user_id, $r AS r, ${phSql(s"cm$r|", "CAST(user_id AS VARCHAR)")} AS bucket FROM u")
      .mkString("\n  UNION ALL ")
    s"""WITH raw AS (
       |  $cellRows),
       |cells AS (SELECT r, bucket, count(*) AS cnt FROM raw GROUP BY r, bucket),
       |u AS (SELECT user_id, count(*) AS n_exact FROM events GROUP BY user_id),
       |probes AS (
       |  $probeRows),
       |est AS (
       |  SELECT p.user_id, min(c.cnt) AS est FROM probes p
       |  JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
       |  GROUP BY p.user_id)
       |SELECT u.user_id, u.n_exact, est.est, est.est - u.n_exact AS overcount
       |FROM u JOIN est ON est.user_id = u.user_id
       |ORDER BY u.user_id""".stripMargin
  }

  // ----------------------------------------------- target encoding
  /** Nearest-event attribution — the NEAREST variant of [[joinAsof]]
    * (pandas `merge_asof(direction='nearest')`): each event resolves
    * to its user's closest signup in time, whichever side it falls
    * on, ties to the earlier (backward) one. Both candidates ride ONE
    * interleaved window pass over the event stream — a backward
    * running max and a forward running min of signup times in the
    * same user-keyed sort — so there is no join at all, which is the
    * trick that makes nearest-as-of cheap at scale (two sorted-merge
    * passes over one shuffle, vs. the naive per-event range join).
    * Users with no signup keep nulls.
    *
    * == Scale design ==
    * One shuffle on the user key; both window frames share the single
    * per-partition sort. O(1) state per row, P-way parallel.
    */
  def joinAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("us"), col("event_id"))
    val back = Window.partitionBy(col("user_id")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id")).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_signup_us",
        max(when(col("event_type") === "signup", col("us"))).over(back))
      .withColumn("next_signup_us",
        min(when(col("event_type") === "signup", col("us"))).over(fwd))
      .withColumn("nearest_signup_us", expr(
        """CASE WHEN prev_signup_us IS NULL THEN next_signup_us
          |     WHEN next_signup_us IS NULL THEN prev_signup_us
          |     WHEN us - prev_signup_us <= next_signup_us - us THEN prev_signup_us
          |     ELSE next_signup_us END""".stripMargin))
      .withColumn("delta_us", abs(col("us") - col("nearest_signup_us")))
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  /** DuckDB twin: identical two-frame window formulation. */
  val joinAsofNearestSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
      |f AS (SELECT event_id, user_id, event_type, us,
      |    max(CASE WHEN event_type = 'signup' THEN us END) OVER
      |      (PARTITION BY user_id ORDER BY us, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_signup_us,
      |    min(CASE WHEN event_type = 'signup' THEN us END) OVER
      |      (PARTITION BY user_id ORDER BY us, event_id
      |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_signup_us
      |  FROM e),
      |n AS (SELECT *,
      |    CASE WHEN prev_signup_us IS NULL THEN next_signup_us
      |         WHEN next_signup_us IS NULL THEN prev_signup_us
      |         WHEN us - prev_signup_us <= next_signup_us - us THEN prev_signup_us
      |         ELSE next_signup_us END AS nearest_signup_us
      |  FROM f)
      |SELECT event_id, user_id, event_type, us, prev_signup_us, next_signup_us,
      |  nearest_signup_us, abs(us - nearest_signup_us) AS delta_us
      |FROM n ORDER BY user_id, us, event_id""".stripMargin

  // --------------------------------------- point-in-time features
}
