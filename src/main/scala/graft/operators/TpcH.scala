package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Extended TPC-H family (Q4/Q10/Q12/Q14/Q18/Q19/Q22 analogs), adapted
  * to the driver corpus's narrower schema (no commit/receipt dates, no
  * shipmode/container/phone — see TESTDATA.md). Together with
  * q1/q3/q5/q6 in [[Analytics]] these cover the classic relational plan
  * shapes a reference user would expect from a batch analytics engine:
  * EXISTS-as-semi-join (Q4), multi-dim star join with top-k (Q10),
  * conditional aggregation over a derived histogram (Q12), a
  * two-aggregate ratio (Q14), HAVING-subquery join-back (Q18),
  * disjunctive multi-column predicates (Q19), and a scalar-subquery
  * threshold with an anti-join (Q22).
  *
  * Every fact-fact orders⋈lineitem leg rides the co-bucketed twin
  * tables ([[Analytics.ensureBucketed]]) — the sort-merge joins and the
  * per-orderkey aggregations consume the bucketed scan partitioning, so
  * none of these queries shuffles the fact tables. Dims broadcast.
  * Money math follows the repo-wide exact-cents contract (integer
  * cents, DECIMAL(38,0) product accumulators, one final IEEE division).
  */
object TpcH {

  private def cents(c: Column): Column = round(c * 100).cast("long")
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
  private def fmtDay(c: Column): Column = date_format(c, "yyyy-MM-dd")
  /** Σ price·(100−disc) in exact integer ten-thousandths → double. */
  private def revenue: Column =
    (sum((cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
      .cast("decimal(38,0)")).cast("double") / 10000.0)

  // ---------------------------------------------------------------- q4
  /** Q4 analog — order-priority checking: orders placed in 1996Q3 with
    * at least one line item shipped more than 60 days after the order
    * date (the corpus has no commit/receipt dates; ship-lag is the
    * equivalent lateness predicate), counted by priority.
    *
    * == Scale design ==
    * The EXISTS compiles to a LEFT SEMI sort-merge join on the bucketed
    * twins: equi-key l_orderkey = o_orderkey carries the join, the
    * date lag rides along as a non-equi post-condition, and the semi
    * form never multiplies rows. Zero hash exchanges before the final
    * O(priorities) aggregation.
    */
  def q4PriorityLate(s: SparkSession, dir: String): DataFrame = {
    val (oTbl, lTbl) = Analytics.ensureBucketed(s, dir)
    val o = s.table(oTbl)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val l = s.table(lTbl)
    o.join(l.hint("merge"),
        col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------- q10
  /** Q10 analog — returned-item revenue: the 20 customers who returned
    * the most revenue in 1996Q1 orders, with their nation.
    *
    * == Scale design ==
    * The returnflag filter prunes the fact scan; the orders⋈lineitem
    * leg is the bucketed SMJ; customer and nation broadcast. The
    * per-customer aggregate shuffles only O(matched customers) rows,
    * and top-20 is TakeOrdered — no global sort materializes.
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val (oTbl, lTbl) = Analytics.ensureBucketed(s, dir)
    val o = s.table(oTbl)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val l = s.table(lTbl).filter(col("l_returnflag") === "R")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0 AS revenue,
      |  count(*) AS n_items
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q12
  /** Q12 analog — shipping-delay histogram: line items bucketed by
    * ship-lag months (floor((ship−order)/30d), clamped to [−3, 6]; the
    * synthetic corpus ships both before and after the order date),
    * counting high-priority (1-URGENT/2-HIGH) vs lower-priority lines
    * per bucket — Q12's CASE-aggregation shape over a derived key.
    *
    * Bucket arithmetic is floor of a DOUBLE division on both engines
    * (Spark integer `div` truncates toward zero while DuckDB `//`
    * floors — they disagree on negative lags, so neither is used).
    *
    * == Scale design ==
    * Bucketed SMJ on the fact leg, then an O(10-bucket) aggregation
    * that collapses map-side. Nothing here scales with anything but
    * the scan.
    */
  def q12DelayHistogram(s: SparkSession, dir: String): DataFrame = {
    val (oTbl, lTbl) = Analytics.ensureBucketed(s, dir)
    val lag = datediff(col("l_shipdate"), col("o_orderdate"))
    val bucket = greatest(least(floor(lag / 30.0).cast("long"), lit(6L)), lit(-3L))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    s.table(lTbl)
      .join(s.table(oTbl).hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(bucket.as("lag_bucket"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("lag_bucket"))
  }

  val q12Sql: String =
    """SELECT greatest(least(CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 30.0) AS BIGINT), 6), -3) AS lag_bucket,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q14
  /** Q14 analog — promotion revenue share for ship-month 1996-03: one
    * row, 100·promo/total as the classic two-aggregate ratio. Both
    * sums are exact integers; the share is a single IEEE division of
    * two exactly-representable doubles, bit-identical across engines.
    *
    * == Scale design ==
    * The ship-month filter prunes the scan; part broadcasts; the whole
    * query is scan + broadcast join + one-row aggregate — no shuffle
    * beyond the final partial merge.
    */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val p = t(s, dir, "part")
    val rev = (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
      .cast("decimal(38,0)")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(38,0)")))
          .as("promo_rev_x"),
        sum(rev).as("total_rev_x"), count(lit(1)).as("n_items"))
      .select(
        (col("promo_rev_x").cast("double") * 100.0 / col("total_rev_x").cast("double"))
          .as("promo_share_pct"),
        (col("promo_rev_x").cast("double") / 10000.0).as("promo_revenue"),
        (col("total_rev_x").cast("double") / 10000.0).as("total_revenue"),
        col("n_items"))
  }

  val q14Sql: String =
    """WITH x AS (SELECT
      |    CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT)) AS rev,
      |    p_type
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01')
      |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE) * 100.0
      |    / CAST(sum(rev) AS DOUBLE) AS promo_share_pct,
      |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE)/10000.0 AS promo_revenue,
      |  CAST(sum(rev) AS DOUBLE)/10000.0 AS total_revenue,
      |  count(*) AS n_items
      |FROM x""".stripMargin

  // --------------------------------------------------------------- q18
  /** Q18 analog — large-volume orders: orders whose total quantity
    * exceeds 200, with customer and order detail. HAVING-subquery
    * join-back, the classic "aggregate then rejoin the fact" shape.
    *
    * == Scale design ==
    * The per-orderkey quantity rollup groups ON the bucket key, so it
    * reuses the bucketed scan partitioning (no exchange), and the
    * join back to orders is bucket-co-located too — the whole
    * fact-side pipeline runs without a single hash exchange; customer
    * broadcasts at the end.
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val (oTbl, lTbl) = Analytics.ensureBucketed(s, dir)
    val big = s.table(lTbl)
      .groupBy(col("l_orderkey"))
      .agg((sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"))
      .filter(col("sum_qty") > 200.0)
    val c = t(s, dir, "customer")
    big.join(s.table(oTbl).hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        fmtDay(col("o_orderdate")).as("o_orderdate"),
        cents(col("o_totalprice")).as("price_cents"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
  }

  val q18Sql: String =
    """WITH big AS (SELECT l_orderkey,
      |    sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 > 200.0)
      |SELECT c_custkey, c_name, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(round(o_totalprice*100) AS BIGINT) AS price_cents, sum_qty
      |FROM big JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY sum_qty DESC, o_orderkey""".stripMargin

  // --------------------------------------------------------------- q19
  /** Q19 analog — disjunctive revenue: three OR'd (brand, size-band,
    * quantity-band) conjunctions, summed to one row. The point is the
    * predicate shape: Catalyst pushes the common l_partkey join key
    * and keeps the disjunction as a single codegen'd filter over the
    * broadcast-joined rows (a naive engine would union three scans).
    */
  def q19DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    val q = col("l_quantity")
    val hit =
      (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) && q.between(1, 20)) ||
      (col("p_brand") === "Brand#19" && col("p_size").between(10, 30) && q.between(10, 35)) ||
      (col("p_brand") === "Brand#25" && col("p_size").between(20, 50) && q.between(20, 50))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(hit)
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
  }

  val q19Sql: String =
    """SELECT
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0 AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
      |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  // --------------------------------------------------------------- q22
  /** Q22 analog — dormant high-balance customers: customers whose
    * balance exceeds the average positive balance and who never placed
    * an URGENT order (every customer orders in this corpus, so plain
    * "no orders" is empty at every SF — joinAnti established that),
    * rolled up by market segment.
    *
    * The threshold compare is EXACT: bal_cents·n_pos > Σpos_cents in
    * integers (cross-multiplied), so no engine ever materializes the
    * average as a double — the last-ulp coin-flip a float threshold
    * would risk at the boundary cannot happen.
    *
    * == Scale design ==
    * The 1-row positive-balance aggregate broadcasts back over the dim
    * scan; the anti join broadcasts the urgent-customer key set
    * (O(customers) keys — when that outgrows broadcast, the same anti
    * join shuffles on the key both sides, still no multiplication).
    */
  def q22DormantSegments(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        cents(col("c_acctbal")).as("bal_cents"))
    val pos = c.filter(col("bal_cents") > 0)
      .agg(count(lit(1)).as("n_pos"), sum(col("bal_cents")).as("s_pos"))
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.crossJoin(broadcast(pos))
      .filter(col("bal_cents") * col("n_pos") > col("s_pos"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        (sum(col("bal_cents")) / 100.0).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val q22Sql: String =
    """WITH c AS (SELECT c_custkey, c_mktsegment,
      |    CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents FROM customer),
      |pos AS (SELECT count(*) AS n_pos, CAST(sum(bal_cents) AS BIGINT) AS s_pos
      |  FROM c WHERE bal_cents > 0)
      |SELECT c_mktsegment, count(*) AS n_custs,
      |  CAST(sum(bal_cents) AS BIGINT)/100.0 AS total_bal
      |FROM c, pos
      |WHERE bal_cents * n_pos > s_pos
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------------------- q13
  /** Q13 analog — customer order-count distribution: how many customers
    * placed exactly k qualifying orders (urgent orders excluded — the
    * corpus has no o_comment, so priority plays the exclusion-filter
    * role), INCLUDING the zero-order customers the left join preserves.
    *
    * == Scale design ==
    * The per-customer count groups the orders fact on o_custkey (one
    * shuffle, map-side combinable); the left join back to customers is
    * a plain equi-join on the same key, and the final histogram groups
    * the O(customers) relation onto O(distinct counts) keys. Nothing
    * quadratic, no window.
    */
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("k"))
    t(s, dir, "customer").select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("k"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """WITH pc AS (SELECT o_custkey, count(*) AS k FROM orders
      |  WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
      |SELECT COALESCE(k, 0) AS c_count, count(*) AS custdist
      |FROM customer LEFT JOIN pc ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --------------------------------------------------------------- q15
  /** Q15 analog — top supplier: the supplier(s) with the maximum
    * lineitem revenue shipped in 1996Q1. The max comparison runs on the
    * EXACT integer ten-thousandths accumulator (DECIMAL(38,0) /
    * HUGEINT), not the divided double, so "equals the max" cannot be
    * flipped by float formatting in one engine only.
    *
    * == Scale design ==
    * One pruned fact scan grouped by l_suppkey (map-side combinable),
    * a 1-row max broadcast back over the O(suppliers) relation, and a
    * broadcast supplier dim join. The classic view+scalar-subquery
    * formulation costs the same single shuffle here.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum((cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
        .cast("decimal(38,0)")).as("rev_i"))
    val mx = rev.agg(max(col("rev_i")).as("max_i"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_i") === col("max_i"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_i").cast("double") / 10000.0).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    """WITH rev AS (SELECT l_suppkey,
      |    sum(CAST(CAST(round(l_extendedprice*100) AS BIGINT)
      |      * (100 - CAST(round(l_discount*100) AS BIGINT)) AS HUGEINT)) AS rev_i
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(rev_i AS DOUBLE)/10000.0 AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_i = (SELECT max(rev_i) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- q17
  /** Q17 analog — small-quantity-order revenue: average yearly revenue
    * lost if Brand#12/MEDIUM small orders (quantity under 20% of that
    * part's average) were not filled. The sub-average predicate is the
    * textbook correlated scalar subquery; here it runs as EXACT integer
    * cross-multiplication (qc·5·n < Σqc ⟺ q < 0.2·avg) so no float
    * average can disagree between engines.
    *
    * == Scale design ==
    * The part filter broadcasts onto the fact scan (brand prune before
    * anything shuffles); per-part moments group on l_partkey and
    * broadcast back onto the same pruned fact relation — two passes
    * over a tiny filtered slice, no window, no correlated re-scan.
    */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#12" && col("p_type") === "MEDIUM")
      .select(col("p_partkey"))
    val l = t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), cents(col("l_quantity")).as("qc"),
        cents(col("l_extendedprice")).as("epc"))
    val stats = l.groupBy(col("l_partkey").as("sp"))
      .agg(sum(col("qc")).as("sum_qc"), count(lit(1)).as("n"))
    l.join(broadcast(stats), col("l_partkey") === col("sp"))
      .filter(col("qc") * 5 * col("n") < col("sum_qc"))
      .agg((sum(col("epc")) / 700.0).as("avg_yearly"))
  }

  val q17Sql: String =
    """WITH p AS (SELECT p_partkey FROM part
      |  WHERE p_brand = 'Brand#12' AND p_type = 'MEDIUM'),
      |l AS (SELECT l_partkey, CAST(round(l_quantity*100) AS BIGINT) AS qc,
      |    CAST(round(l_extendedprice*100) AS BIGINT) AS epc
      |  FROM lineitem JOIN p ON l_partkey = p_partkey),
      |st AS (SELECT l_partkey AS sp, CAST(sum(qc) AS BIGINT) AS sum_qc,
      |    count(*) AS n FROM l GROUP BY 1)
      |SELECT CAST(sum(epc) AS BIGINT)/700.0 AS avg_yearly
      |FROM l JOIN st ON l_partkey = sp
      |WHERE qc * 5 * n < sum_qc""".stripMargin

  // ---------------------------------------------------------------- q7
  /** Q7 analog — volume shipping between two nations: revenue flowing
    * supplier-nation → customer-nation for the NATION_1/NATION_2 pair,
    * by ship year and direction. With both dims pre-filtered to the two
    * nations, the classic pair disjunction reduces to
    * `supp_nation ≠ cust_nation` — same result, half the predicate.
    *
    * == Scale design ==
    * The orders⋈lineitem leg rides the bucketed twins (zero fact hash
    * exchanges); supplier/customer arrive ALREADY nation-filtered as
    * broadcasts, so the fact stream is pruned by two tiny hash probes
    * before the O(2·years) aggregation.
    */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    val (oTbl, lTbl) = Analytics.ensureBucketed(s, dir)
    val nations = Seq("NATION_1", "NATION_2")
    val sup = t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(nations: _*))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(nations: _*))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    s.table(lTbl)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .hint("merge")
      .join(s.table(oTbl), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(revenue.as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(sum(CAST(CAST(round(l_extendedprice*100) AS BIGINT)
      |    * (100 - CAST(round(l_discount*100) AS BIGINT)) AS HUGEINT)) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND o_custkey = c_custkey
      |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |  AND n1.n_name IN ('NATION_1', 'NATION_2')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q8
  /** Q8 analog — market share: NATION_1 suppliers' share of all revenue
    * shipped to EUROPE-region customers, per ship year (the corpus has
    * no part types, so the classic part filter is elided). The share is
    * a per-year two-sum ratio, both sums exact DECIMAL(38,0)
    * ten-thousandths; the ppm column is an integral division of the
    * exact accumulators (Q14's ratio pattern, per group).
    *
    * == Scale design ==
    * Same bucketed fact leg; customers arrive region-filtered via the
    * broadcast nation⋈region dim chain; the conditional numerator is a
    * CASE inside one aggregation — one pass, no second join or union.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val (oTbl, lTbl) = Analytics.ensureBucketed(s, dir)
    val sup = t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("c_custkey"))
    val volNum = (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
      .cast("decimal(38,0)")
    s.table(lTbl).hint("merge")
      .join(s.table(oTbl), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_1", volNum)
          .otherwise(lit(0).cast("decimal(38,0)"))).as("num_i"),
        sum(volNum).as("den_i"))
      .select(col("l_year"),
        (col("num_i").cast("double") / 10000.0).as("nation_volume"),
        (col("den_i").cast("double") / 10000.0).as("total_volume"),
        expr("num_i * 1000000 div den_i").as("share_ppm"))
      .orderBy(col("l_year"))
  }

  val q8Sql: String =
    """WITH v AS (SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    n1.n_name AS supp_nation,
      |    CAST(CAST(round(l_extendedprice*100) AS BIGINT)
      |      * (100 - CAST(round(l_discount*100) AS BIGINT)) AS HUGEINT) AS vol
      |  FROM lineitem, orders, supplier, customer, nation n1, nation n2, region
      |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |    AND o_custkey = c_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND n2.n_regionkey = r_regionkey AND r_name = 'EUROPE')
      |SELECT l_year,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol ELSE 0 END) AS DOUBLE)/10000.0 AS nation_volume,
      |  CAST(sum(vol) AS DOUBLE)/10000.0 AS total_volume,
      |  CAST((sum(CASE WHEN supp_nation = 'NATION_1' THEN vol ELSE 0 END) * 1000000)
      |    // sum(vol) AS BIGINT) AS share_ppm
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q2
  /** Q2 analog — minimum-cost supplier: for each MEDIUM size-25 part,
    * the supplier(s) whose cheapest observed shipment total is the
    * part's global minimum (the corpus has no partsupp relation, so
    * supply cost is derived from lineitem history). Q2's correlated
    * `cost = (SELECT min(cost) …)` compiles to an aggregate join-back.
    *
    * == Scale design ==
    * The part filter broadcasts into the fact scan, so the offers
    * relation is O(matched parts × suppliers) — fact-sized input, tiny
    * output. The correlated min is an unbounded window-min over the
    * offers aggregation's own partitioning — ONE exchange for the agg
    * plus the window's partkey repartition, no second aggregate and no
    * join-back (the oracle keeps the textbook aggregate-join
    * formulation, deliberately different). Every dim joins as a
    * broadcast. Cost is exact integer cents end-to-end; the only float
    * is the presentation division.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .filter(col("p_size") === 25 && col("p_type") === "MEDIUM")
      .select(col("p_partkey"), col("p_brand"))
    val offers = t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("p_brand"), col("l_suppkey"))
      .agg(min(cents(col("l_extendedprice"))).as("cost_c"))
    val w = Window.partitionBy(col("l_partkey"))
    offers
      .withColumn("best_c", min(col("cost_c")).over(w))
      .filter(col("cost_c") === col("best_c"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("p_brand"),
        (col("cost_c") / 100.0).as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String =
    """WITH p AS (SELECT p_partkey, p_brand FROM part
      |  WHERE p_size = 25 AND p_type = 'MEDIUM'),
      |offers AS (SELECT l_partkey, p_brand, l_suppkey,
      |    min(CAST(round(l_extendedprice*100) AS BIGINT)) AS cost_c
      |  FROM lineitem JOIN p ON l_partkey = p_partkey GROUP BY 1, 2, 3),
      |best AS (SELECT l_partkey AS bp, min(cost_c) AS best_c
      |  FROM offers GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_brand,
      |  cost_c/100.0 AS cost
      |FROM offers JOIN best ON l_partkey = bp AND cost_c = best_c
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q9
  /** Q9 analog — product-type profit by supplier nation and order
    * year, for parts named like '%red%'. With no partsupp supply cost
    * in the corpus, cost is proxied by p_retailprice × quantity, so
    * profit = Σ (price·(100−disc) − retail·qty) — every term an exact
    * integer ten-thousandth of a dollar, summed in DECIMAL(38,0).
    *
    * == Scale design ==
    * The orders⋈lineitem leg rides the bucketed twins (the v2 layout
    * carries l_partkey precisely for this query); part and
    * supplier-nation arrive as broadcast prunes. One pass, one
    * O(nations × years) aggregation exchange.
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val (oTbl, lTbl) = Analytics.ensureBucketed(s, dir)
    val p = t(s, dir, "part").filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), cents(col("p_retailprice")).as("rc"))
    val sup = t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    s.table(lTbl).hint("merge")
      .join(s.table(oTbl), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum((cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))
          - col("rc") * cents(col("l_quantity")))
        .cast("decimal(38,0)")).cast("double") / 10000.0).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CAST(CAST(round(l_extendedprice*100) AS BIGINT)
      |      * (100 - CAST(round(l_discount*100) AS BIGINT))
      |      - CAST(round(p_retailprice*100) AS BIGINT)
      |      * CAST(round(l_quantity*100) AS BIGINT) AS HUGEINT))
      |    AS DOUBLE)/10000.0 AS profit
      |FROM lineitem, orders, part, supplier, nation
      |WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // --------------------------------------------------------------- q11
  /** Q11 analog — important parts: parts whose NATION_1-supplied value
    * exceeds 1.2× the per-part average (Q11's scalar-subquery HAVING
    * threshold, made corpus-size-invariant: a fixed fraction of the
    * grand total would select everything or nothing as the part count
    * scales). The cut `value · n_parts · 5 > total · 6` is exact
    * integer cross-multiplication — no float threshold anywhere.
    *
    * == Scale design ==
    * One fact pass pruned by a broadcast supplier filter, one
    * O(parts) aggregation; the grand total is a one-row aggregate
    * broadcast back over the per-part relation (the [[TextOps]] tf-idf
    * corpus-count pattern). Nothing fact-sized crosses the driver.
    */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val sup1 = t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_1")
      .select(col("s_suppkey"))
    val vals = t(s, dir, "lineitem")
      .join(broadcast(sup1), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(cents(col("l_extendedprice")).cast("decimal(38,0)")).as("value_c"))
    val tot = vals.agg(sum(col("value_c")).as("total_c"),
      count(lit(1)).as("n_parts"))
    vals.crossJoin(broadcast(tot))
      .filter(col("value_c") * col("n_parts") * 5 > col("total_c") * 6)
      .select(col("p_partkey"),
        (col("value_c").cast("double") / 100.0).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  val q11Sql: String =
    """WITH v AS (SELECT l_partkey AS p_partkey,
      |    sum(CAST(CAST(round(l_extendedprice*100) AS BIGINT) AS HUGEINT)) AS value_c
      |  FROM lineitem, supplier, nation
      |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_name = 'NATION_1'
      |  GROUP BY 1),
      |tot AS (SELECT sum(value_c) AS total_c, count(*) AS n_parts FROM v)
      |SELECT p_partkey, CAST(value_c AS DOUBLE)/100.0 AS value
      |FROM v, tot WHERE value_c * n_parts * 5 > total_c * 6
      |ORDER BY value DESC, p_partkey""".stripMargin

  // --------------------------------------------------------------- q16
  /** Q16 analog — parts/supplier relationship: how many distinct
    * suppliers (excluding overdrawn ones — the corpus's stand-in for
    * Q16's complaint filter) ship each surviving (brand, type, size)
    * combination. Q16's NOT IN compiles to a broadcast anti-join
    * against the tiny excluded-supplier set.
    *
    * == Scale design ==
    * Both filters broadcast into the single fact pass; the distinct
    * aggregation shuffles the deduplicated (brand, type, size,
    * suppkey) relation — bounded by |parts|×|suppliers|, not by the
    * fact table. count(DISTINCT) over pre-pruned keys is the
    * map-side-combinable form.
    */
  def q16SupplierParts(s: SparkSession, dir: String): DataFrame = {
    val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("bad_key"))
    val p = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#12" && col("p_type") =!= "MEDIUM"
        && col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    t(s, dir, "lineitem")
      .join(broadcast(bad), col("l_suppkey") === col("bad_key"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND p_brand <> 'Brand#12' AND p_type <> 'MEDIUM'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // --------------------------------------------------------------- q20
  /** Q20 analog — majority shippers: NATION_1 suppliers who shipped
    * more than half of some red part's total 1996 volume (the corpus
    * has no availqty, so Q20's excess-stock test becomes a majority-
    * share test over shipped quantity — same nested semi-join chain).
    * The half test is exact: 2·supplier_qty > part_qty in integer
    * quantity-cents.
    *
    * == Scale design ==
    * One filtered fact pass → O(parts × suppliers) aggregate; the
    * per-part total joins back on the aggregate's own key (exchange
    * reuse); the final supplier probe is a semi-join against a
    * distinct key set that is at most |suppliers| — broadcast-sized
    * by construction.
    */
  def q20ExcessShippers(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(col("p_name").like("red%"))
      .select(col("p_partkey"))
    val shipped = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(cents(col("l_quantity")).cast("decimal(38,0)")).as("sq"))
    val totals = shipped.groupBy(col("l_partkey").as("tp"))
      .agg(sum(col("sq")).as("tq"))
    val excess = shipped
      .join(totals, col("l_partkey") === col("tp") && col("sq") * 2 > col("tq"))
      .select(col("l_suppkey")).distinct()
    t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_1")
      .join(broadcast(excess), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val q20Sql: String =
    """WITH p AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
      |sh AS (SELECT l_partkey, l_suppkey,
      |    sum(CAST(CAST(round(l_quantity*100) AS BIGINT) AS HUGEINT)) AS sq
      |  FROM lineitem JOIN p ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1, 2),
      |tot AS (SELECT l_partkey AS tp, sum(sq) AS tq FROM sh GROUP BY 1)
      |SELECT s_name, s_acctbal FROM supplier, nation
      |WHERE s_nationkey = n_nationkey AND n_name = 'NATION_1'
      |  AND s_suppkey IN (SELECT l_suppkey FROM sh
      |    JOIN tot ON l_partkey = tp AND sq*2 > tq)
      |ORDER BY s_name""".stripMargin

  // --------------------------------------------------------------- q21
  /** Q21 analog — suppliers who kept orders waiting: NATION_1
    * suppliers whose line shipped >60 days after the order date on a
    * finished ('F') order that involved at least one other supplier,
    * where no OTHER supplier shipped late. Q21's EXISTS / NOT EXISTS
    * pair compiles to a semi-join and an anti-join on the same order
    * key, counted per l1 line like the classic query.
    *
    * == Scale design ==
    * Every join in the chain — late⋈orders, the EXISTS semi, the NOT
    * EXISTS anti — is keyed on l_orderkey, so all three legs consume
    * the bucketed twins' scan partitioning: zero fact hash exchanges
    * (plan-asserted in PlanShapeSpec). The NATION_1 supplier probe
    * broadcasts. The only exchange is the final O(suppliers)
    * aggregation.
    */
  def q21WaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val (oTbl, lTbl) = Analytics.ensureBucketed(s, dir)
    val sup1 = t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_1")
      .select(col("s_suppkey"), col("s_name"))
    val late = s.table(lTbl).hint("merge")
      .join(s.table(oTbl).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val l1 = late.join(broadcast(sup1), col("l_suppkey") === col("s_suppkey"))
    val others = s.table(lTbl)
      .select(col("l_orderkey").as("o2_key"), col("l_suppkey").as("s2_key"))
    val lateOthers = late
      .select(col("l_orderkey").as("o3_key"), col("l_suppkey").as("s3_key"))
    l1.join(others.hint("merge"),
        col("l_orderkey") === col("o2_key") && col("s2_key") =!= col("l_suppkey"),
        "left_semi")
      .join(lateOthers.hint("merge"),
        col("l_orderkey") === col("o3_key") && col("s3_key") =!= col("l_suppkey"),
        "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """WITH late AS (SELECT l_orderkey, l_suppkey FROM lineitem, orders
      |  WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F'
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |SELECT s_name, count(*) AS numwait
      |FROM late l1, supplier, nation
      |WHERE l1.l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_name = 'NATION_1'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> q2MinCostSupplier,
    "q9_product_profit" -> q9ProductProfit,
    "q11_important_parts" -> q11ImportantParts,
    "q16_supplier_parts" -> q16SupplierParts,
    "q20_excess_shippers" -> q20ExcessShippers,
    "q21_waiting_suppliers" -> q21WaitingSuppliers,
    "q7_nation_volume" -> q7NationVolume,
    "q8_market_share" -> q8MarketShare,
    "q13_custdist" -> q13CustDist,
    "q15_top_supplier" -> q15TopSupplier,
    "q17_small_quantity" -> q17SmallQuantity,
    "q4_priority_late" -> q4PriorityLate,
    "q10_returned_items" -> q10ReturnedItems,
    "q12_delay_histogram" -> q12DelayHistogram,
    "q14_promo_share" -> q14PromoShare,
    "q18_large_orders" -> q18LargeOrders,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue,
    "q22_dormant_segments" -> q22DormantSegments)

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" -> q2Sql,
    "q9_product_profit" -> q9Sql,
    "q11_important_parts" -> q11Sql,
    "q16_supplier_parts" -> q16Sql,
    "q20_excess_shippers" -> q20Sql,
    "q21_waiting_suppliers" -> q21Sql,
    "q7_nation_volume" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "q13_custdist" -> q13Sql,
    "q15_top_supplier" -> q15Sql,
    "q17_small_quantity" -> q17Sql,
    "q4_priority_late" -> q4Sql,
    "q10_returned_items" -> q10Sql,
    "q12_delay_histogram" -> q12Sql,
    "q14_promo_share" -> q14Sql,
    "q18_large_orders" -> q18Sql,
    "q19_disjunctive_revenue" -> q19Sql,
    "q22_dormant_segments" -> q22Sql)
}
