package graft

import graft.operators.TpcH
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantic checks for the extended TPC-H family — each against an
  * independently recomputed Scala model (the DuckDB oracle shares the
  * SQL's shape, so these pin the semantics a second way).
  */
class TpcHSpec extends SparkSpec {
  import spark.implicits._

  test("q12 buckets floor negative ship-lags (not truncate-toward-zero)") {
    val pairs = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")),
        col("o_orderpriority"))
      .as[(Int, String)].collect()
    val model = pairs.groupBy { case (lag, _) =>
      math.max(math.min(math.floor(lag / 30.0).toLong, 6L), -3L)
    }.map { case (b, rs) =>
      b -> ((rs.count(r => Set("1-URGENT", "2-HIGH")(r._2)).toLong,
        rs.count(r => !Set("1-URGENT", "2-HIGH")(r._2)).toLong))
    }
    val got = TpcH.q12DelayHistogram(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (b, h, l) => b -> ((h, l)) }.toMap
    assert(got == model, s"got $got expected $model")
    // the corpus really does ship before ordering sometimes — the
    // floor-vs-truncate distinction must be exercised, not vacuous
    assert(model.keys.exists(_ < 0), "no negative lag bucket in corpus")
  }

  test("q22's integer cross-multiplied threshold equals the float-average cut") {
    val custs = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long"))
      .as[(Long, String, Long)].collect()
    val pos = custs.map(_._3).filter(_ > 0)
    val (nPos, sPos) = (pos.length.toLong, pos.sum)
    val urgent = Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").as[Long].collect().toSet
    val model = custs
      .filter { case (k, _, b) => b * nPos > sPos && !urgent(k) }
      .groupBy(_._2).map { case (seg, rs) =>
        seg -> ((rs.length.toLong, rs.map(_._3).sum / 100.0))
      }
    val got = TpcH.q22DormantSegments(spark, sf)
      .as[(String, Long, Double)].collect()
      .map { case (s, n, b) => s -> ((n, b)) }.toMap
    assert(got == model, s"got $got expected $model")
  }

  test("q14 promo share is the exact two-sum ratio times 100") {
    val row = TpcH.q14PromoShare(spark, sf)
      .select("promo_share_pct", "promo_revenue", "total_revenue", "n_items")
      .as[(Double, Double, Double, Long)].head()
    val (pct, promo, total, n) = row
    assert(n > 0 && promo > 0 && total >= promo)
    assert(pct > 0 && pct < 100)
    // the emitted share must be the ratio of the emitted components
    // (all three come from the same exact integer sums)
    assert(math.abs(pct - promo * 100.0 / total) < 1e-9)
  }

  test("q18 returns exactly the orders whose quantity rollup exceeds 200") {
    val model = Tables.load(spark, sf, "lineitem")
      .groupBy("l_orderkey")
      .agg((sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("q"))
      .filter(col("q") > 200.0)
      .select("l_orderkey").as[Long].collect().toSet
    val got = TpcH.q18LargeOrders(spark, sf)
      .select("o_orderkey").as[Long].collect()
    assert(got.toSet == model, "order set drifted")
    assert(got.length == model.size, "join-back must not duplicate orders")
  }

  test("q13 distribution includes zero-order customers and sums to the customer count") {
    // sf0.001's corpus gives every customer an order; the driver's
    // correctness scale has a zero-order customer, which the LEFT join
    // must preserve (the bucket an inner join silently drops)
    val dir = sfMid
    assume(new java.io.File(dir).isDirectory, s"$dir absent — cancelling, not failing")
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey").as[Long].collect()
    val nCust = Tables.load(spark, dir, "customer").count()
    val perCust = orders.groupBy(identity).map { case (c, v) => c -> v.length.toLong }
    val model = (Tables.load(spark, dir, "customer")
      .select("c_custkey").as[Long].collect()
      .map(c => perCust.getOrElse(c, 0L)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = TpcH.q13CustDist(spark, dir)
      .select("c_count", "custdist").as[(Long, Long)].collect()
    assert(got.toMap == model, "distribution drifted")
    assert(got.map(_._2).sum == nCust, "every customer must appear in exactly one bucket")
    assert(model.contains(0L), "zero-order bucket must be exercised, not vacuous")
  }

  test("q15 winners carry exactly the maximum exact-integer revenue") {
    val rows = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
    val rev = rows.groupBy(_._1).map { case (sk, v) =>
      sk -> v.map { case (_, ep, d) => BigInt(ep) * (100 - d) }.sum
    }
    val mx = rev.values.max
    val model = rev.filter(_._2 == mx).map { case (sk, r) =>
      sk -> r.toDouble / 10000.0
    }
    val got = TpcH.q15TopSupplier(spark, sf)
      .select("s_suppkey", "total_revenue").as[(Long, Double)].collect()
    assert(got.toMap == model, "winner set or revenue drifted")
  }

  test("q17 integer cross-multiplication equals the float 0.2·avg predicate") {
    val pk = Tables.load(spark, sf, "part")
      .filter(col("p_brand") === "Brand#12" && col("p_type") === "MEDIUM")
      .select("p_partkey").as[Long].collect().toSet
    assert(pk.nonEmpty, "filter part set must be non-empty")
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"), round(col("l_quantity") * 100).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
      .filter(r => pk(r._1))
    assert(li.nonEmpty, "qualifying lineitems must exist")
    val byPart = li.groupBy(_._1)
    val modelSum = byPart.values.flatMap { v =>
      val avg = v.map(_._2).sum.toDouble / v.length // float formulation
      v.filter(_._2 < 0.2 * avg).map(_._3)
    }.sum
    val got = TpcH.q17SmallQuantity(spark, sf)
      .select("avg_yearly").as[Double].collect().head
    assert(got == modelSum / 700.0, "integer cut drifted from the float-average cut")
  }

  test("q7 directional volumes match an in-memory join and cover both directions") {
    // sf0.001 has no NATION_1<->NATION_2 trades in the window; the
    // driver's correctness scale exercises both directions
    val dir = sfMid
    assume(new java.io.File(dir).isDirectory, s"$dir absent — cancelling, not failing")
    val nk = Tables.load(spark, dir, "nation")
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    val sup = Tables.load(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey").as[(Long, Long)].collect()
      .map { case (k, n) => k -> nk(n) }.toMap
    val cust = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_nationkey").as[(Long, Long)].collect()
      .map { case (k, n) => k -> nk(n) }.toMap
    val ordCust = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        year(col("l_shipdate")), col("l_shipdate").cast("string"))
      .as[(Long, Long, Long, Long, Int, String)].collect()
    val pair = Set("NATION_1", "NATION_2")
    val model = li.filter(r => r._6 >= "1996-01-01" && r._6 < "1998-01-01")
      .flatMap { case (ok, sk, ep, d, yr, _) =>
        val sn = sup(sk); val cn = cust(ordCust(ok))
        if (pair(sn) && pair(cn) && sn != cn)
          Some((sn, cn, yr.toLong) -> (BigInt(ep) * (100 - d))) else None
      }
      .groupBy(_._1).map { case (k, v) =>
        k -> (v.map(_._2).sum.toDouble / 10000.0)
      }
    val got = TpcH.q7NationVolume(spark, dir)
      .select("supp_nation", "cust_nation", "l_year", "revenue")
      .as[(String, String, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2, r._3) -> r._4).toMap == model, "q7 volumes drifted")
    // both trade directions must be exercised, not vacuous
    assert(got.map(_._1).toSet == pair, s"expected both directions, got ${got.toSeq}")
  }

  test("q8 share_ppm is the exact integral ratio of the emitted volumes") {
    // NATION_1 holds no EUROPE-bound share in the tiny sf0.001 slice
    val dir = sfMid
    assume(new java.io.File(dir).isDirectory, s"$dir absent — cancelling, not failing")
    val got = TpcH.q8MarketShare(spark, dir)
      .select("l_year", "nation_volume", "total_volume", "share_ppm")
      .as[(Long, Double, Double, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (y, num, den, ppm) =>
      assert(num >= 0 && num <= den, s"year $y: numerator outside [0, total]")
      // reconstruct the exact integer accumulators from the doubles
      // (both are integer ten-thousandths scaled down, exact in double)
      val numI = BigInt(math.round(num * 10000))
      val denI = BigInt(math.round(den * 10000))
      assert(ppm == (numI * 1000000 / denI).toLong, s"year $y: ppm mismatch")
    }
    assert(got.exists(_._4 > 0), "NATION_1 must hold some share somewhere")
  }

  test("window_distribution quartiles partition each priority class near-evenly") {
    val got = graft.operators.Analytics.windowDistribution(spark, sf)
      .select("o_orderpriority", "pct_rank", "cume", "quartile")
      .as[(String, Double, Double, Long)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).values.foreach { rows =>
      val n = rows.length
      // quartile sizes differ by at most 1 (ntile contract)
      val sizes = rows.groupBy(_._4).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, "ntile sizes must be balanced")
      // cume_dist of the max-price row is exactly 1.0
      assert(rows.map(_._3).max == 1.0)
      // percent_rank stays in [0, 1] with 0 present (the min row)
      assert(rows.map(_._2).min == 0.0 && rows.map(_._2).max <= 1.0)
      // ties share pct_rank: recompute (rank-1)/(n-1) per row group
      val byRank = rows.groupBy(_._2)
      assert(byRank.values.map(_.size).sum == n)
    }
  }

  test("q2 returns exactly the suppliers achieving each part's minimum cost") {
    val parts = Tables.load(spark, sf, "part")
      .filter(col("p_size") === 25 && col("p_type") === "MEDIUM")
      .select("p_partkey").as[Long].collect().toSet
    val offers = Tables.load(spark, sf, "lineitem")
      .filter(col("l_partkey").isin(parts.toSeq: _*))
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).map { case (k, rs) => k -> rs.map(_._3).min }
    val best = offers.groupBy(_._1._1).map { case (p, os) => p -> os.values.min }
    val model = offers.collect {
      case ((p, sk), c) if c == best(p) => (p, sk, c / 100.0)
    }.toSet
    val got = TpcH.q2MinCostSupplier(spark, sf)
      .select("p_partkey", "cost").as[(Long, Double)].collect()
    // at this SF the full answer fits under the LIMIT, so the spec can
    // demand the complete min-achiever set, not a prefix of it
    assert(model.size <= 100, "fixture drifted: answer no longer fits the limit")
    assert(got.length == model.size, "row count drifted")
    assert(got.toSet == model.map(m => (m._1, m._3)),
      "(part, cost) pairs must be exactly the per-part minima")
    got.groupBy(_._1).foreach { case (p, rs) =>
      rs.foreach { case (_, c) => assert(c == best(p) / 100.0) }
    }
  }

  test("q11's cross-multiplied threshold equals the 1.2x-average float cut") {
    // the driver correctness scale: sf0.001 selects an empty set
    // for this query's filters, which would make the spec vacuous
    val dir = sfMid
    assume(new java.io.File(dir).isDirectory, s"$dir absent — cancelling, not failing")
    val sup1 = Tables.load(spark, dir, "supplier")
      .join(Tables.load(spark, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_1")
      .select("s_suppkey").as[Long].collect().toSet
    val vals = Tables.load(spark, dir, "lineitem")
      .filter(col("l_suppkey").isin(sup1.toSeq: _*))
      .select(col("l_partkey"), round(col("l_extendedprice") * 100).cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).map(BigInt(_)).sum }
    val (total, n) = (vals.values.sum, vals.size)
    val modelKeys = vals.filter { case (_, v) => v * n * 5 > total * 6 }.keySet
    // the integer cut is the float 1.2x-average cut (no boundary case
    // can differ: both sides of the comparison are exact integers)
    val floatKeys = vals.filter { case (_, v) =>
      v.toDouble > 1.2 * (total.toDouble / n) }.keySet
    val got = TpcH.q11ImportantParts(spark, dir)
      .select("p_partkey").as[Long].collect()
    assert(got.toSet == modelKeys && got.length == modelKeys.size)
    assert(modelKeys == floatKeys, "integer and float cuts must agree here")
    assert(modelKeys.nonEmpty && modelKeys.size < vals.size,
      "threshold must be selective, not vacuous")
  }

  test("q16 never counts an overdrawn supplier and counts each at most once") {
    // the driver correctness scale: sf0.001 selects an empty set
    // for this query's filters, which would make the spec vacuous
    val dir = sfMid
    assume(new java.io.File(dir).isDirectory, s"$dir absent — cancelling, not failing")
    val bad = Tables.load(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey").as[Long].collect().toSet
    assert(bad.nonEmpty, "fixture drifted: no overdrawn suppliers to exclude")
    val pmeta = Tables.load(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#12" && col("p_type") =!= "MEDIUM"
        && col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select("p_partkey", "p_brand", "p_type", "p_size")
      .as[(Long, String, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val model = Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").as[(Long, Long)].collect()
      .filter { case (p, sk) => pmeta.contains(p) && !bad(sk) }
      .map { case (p, sk) => (pmeta(p), sk) }.distinct
      .groupBy(_._1).map { case (k, rs) => k -> rs.length.toLong }
    val got = TpcH.q16SupplierParts(spark, dir)
      .as[(String, String, Int, Long)].collect()
      .map { case (b, t, sz, c) => (b, t, sz) -> c }.toMap
    assert(got == model, "distinct supplier counts drifted")
  }

  test("q20 returns exactly the NATION_1 majority shippers of some red part") {
    // the driver correctness scale: sf0.001 selects an empty set
    // for this query's filters, which would make the spec vacuous
    val dir = sfMid
    assume(new java.io.File(dir).isDirectory, s"$dir absent — cancelling, not failing")
    val red = Tables.load(spark, dir, "part")
      .filter(col("p_name").like("red%")).select("p_partkey")
      .as[Long].collect().toSet
    val sh = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_quantity") * 100).cast("long"))
      .as[(Long, Long, Long)].collect().filter(r => red(r._1))
      .groupBy(r => (r._1, r._2)).map { case (k, rs) => k -> rs.map(_._3).sum }
    val tot = sh.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val majority = sh.collect {
      case ((p, sk), q) if 2 * q > tot(p) => sk
    }.toSet
    val n1names = Tables.load(spark, dir, "supplier")
      .join(Tables.load(spark, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_1")
      .select("s_suppkey", "s_name").as[(Long, String)].collect()
    val model = n1names.filter(r => majority(r._1)).map(_._2).sorted
    val got = TpcH.q20ExcessShippers(spark, dir).select("s_name")
      .as[String].collect()
    assert(got.toSeq == model.toSeq, s"got ${got.toList} expected ${model.toList}")
    assert(got.nonEmpty, "fixture drifted: no majority shipper left")
  }

  test("q21 counts late lines on multi-supplier F orders with no other late supplier") {
    // the driver correctness scale: sf0.001 selects an empty set
    // for this query's filters, which would make the spec vacuous
    val dir = sfMid
    assume(new java.io.File(dir).isDirectory, s"$dir absent — cancelling, not failing")
    val lines = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("o_orderstatus"),
        datediff(col("l_shipdate"), col("o_orderdate")))
      .as[(Long, Long, String, Int)].collect()
    val suppsByOrder = lines.groupBy(_._1)
      .map { case (o, rs) => o -> rs.map(_._2).toSet }
    // timestamps are day-aligned (asserted below), so the interval
    // predicate l_shipdate > o_orderdate + 60d is exactly datediff > 60
    val late = lines.filter(r => r._3 == "F" && r._4 > 60)
    val lateByOrder = late.groupBy(_._1)
      .map { case (o, rs) => o -> rs.map(_._2).toSet }
    val n1 = Tables.load(spark, dir, "supplier")
      .join(Tables.load(spark, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_1")
      .select("s_suppkey", "s_name").as[(Long, String)].collect().toMap
    val model = late
      .filter { case (o, sk, _, _) => n1.contains(sk) &&
        (suppsByOrder(o) - sk).nonEmpty && (lateByOrder(o) - sk).isEmpty }
      .groupBy(r => n1(r._2)).map { case (nm, rs) => nm -> rs.length.toLong }
    val got = TpcH.q21WaitingSuppliers(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == model, s"got $got expected $model")
    assert(model.nonEmpty, "fixture drifted: no waiting supplier left")
    val misaligned = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") =!= date_trunc("day", col("l_shipdate"))).count()
    assert(misaligned == 0, "shipdates gained a time component; datediff model invalid")
  }

  test("q9 profit is the exact revenue-minus-retail-cost recompute") {
    val red = Tables.load(spark, sf, "part")
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), round(col("p_retailprice") * 100).cast("long"))
      .as[(Long, Long)].collect().toMap
    val supNation = Tables.load(spark, sf, "supplier")
      .join(Tables.load(spark, sf, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name").as[(Long, String)].collect().toMap
    val oyear = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long"))
      .as[(Long, Long)].collect().toMap
    val model = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_quantity") * 100).cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .filter(r => red.contains(r._2))
      .groupBy(r => (supNation(r._3), oyear(r._1)))
      .map { case (k, rs) =>
        k -> rs.map(r => BigInt(r._4) * (100 - r._5) - BigInt(red(r._2)) * r._6).sum
      }
    val got = TpcH.q9ProductProfit(spark, sf)
      .as[(String, Long, Double)].collect()
      .map { case (n, y, p) => (n, y) -> p }.toMap
    assert(got.keySet == model.keySet)
    got.foreach { case (k, p) =>
      assert(p == (BigDecimal(model(k)) / 10000).toDouble, s"profit drifted at $k")
    }
  }
}
