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
}
