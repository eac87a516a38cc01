package graft

import graft.operators.{Analytics, Geo}

/** Plan-shape regression guards: the scale properties SURVEY §5 claims
  * (pushdown, pruning, broadcast) must be visible in the physical
  * plan, not just asserted in prose. Pinned to Spark 4.1 plan strings.
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1 pushes the shipdate range into the parquet scan") {
    val plan = planOf(Analytics.q1PricingSummary(spark, sf))
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"missing pushdown:\n$plan")
  }

  test("rasterize reads only event_id from the events scan") {
    val plan = planOf(Geo.geoRasterize(spark, sf))
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(s => s == "event_id:bigint"),
      s"expected single-column scan, got $readSchemas")
  }

  test("q5 joins all dimensions via broadcast (no sort-merge join at this scale)") {
    val plan = planOf(Analytics.q5LocalSupplier(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 5, s"expected >=5 broadcast joins, got $broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("as-of join plans as a single window pass, not a join") {
    val plan = planOf(Analytics.joinAsof(spark, sf))
    assert(!plan.contains("Join"), s"as-of should be join-free:\n$plan")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      s"expected a window operator:\n$plan")
  }
}
