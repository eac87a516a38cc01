package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize splits on >30min gaps and keeps within-gap events together") {
    // crafted: user 1 has events at t0, t0+10min, t0+50min (gap) , user 2 one event
    val base = 1700000000000000L // epoch micros
    val df = Seq(
      (1L, 1L, base, 10.0),
      (1L, 2L, base + 10L * 60 * 1000000, 20.0),
      (1L, 3L, base + 50L * 60 * 1000000, 30.0),
      (2L, 4L, base, 5.0))
      .toDF("user_id", "event_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("event_type", lit("click"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    df.write.mode("overwrite").parquet("/tmp/graft-test/events.parquet")
    val out = Analytics.sessionize(spark, "/tmp/graft-test")
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)]
      .collect().toSet
    assert(out == Set((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("q1 aggregates are decimal-exact and grouped correctly") {
    val out = Analytics.q1PricingSummary(spark, sf).collect()
    assert(out.nonEmpty)
    val row = out.head
    val n = row.getAs[Long]("count_order")
    val avgQty = row.getAs[Double]("avg_qty")
    val sumQty = row.getAs[Double]("sum_qty")
    assert(math.abs(avgQty - sumQty / n) < 1e-9)
  }

  test("topk_per_group returns at most 3 rows per customer, ranked") {
    val out = Analytics.topkPerGroup(spark, sf)
    val bad = out.groupBy("o_custkey").agg(count(lit(1)).as("n"),
      max(col("rn")).as("maxrn")).filter(col("n") > 3 || col("maxrn") > 3)
    assert(bad.count() == 0)
  }

  test("saltedAgg equals plain aggregation") {
    val events = graft.sources.Tables.load(spark, sf, "events")
    val plain = events.groupBy(col("user_id")).agg(
      sum(round(col("value") * 100).cast("long")).as("sum_v"),
      count(lit(1)).as("n"))
      .select("user_id", "sum_v", "n").as[(Long, Long, Long)].collect().toSet
    val salted = Analytics.saltedAgg(events, col("user_id"),
      round(col("value") * 100).cast("long"))
      .select("k", "sum_v", "n").as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("join_semi + join_anti partition the urgent-order space") {
    val semiN = Analytics.joinSemi(spark, sf).count()
    val antiN = Analytics.joinAnti(spark, sf).count()
    val custN = graft.sources.Tables.load(spark, sf, "customer").count()
    assert(semiN <= custN && antiN <= custN)
    // anti is w.r.t. urgent orders only; semi is w.r.t. any order
    assert(semiN + antiN >= custN) // every customer is in semi; anti ⊂ semi
  }
}
