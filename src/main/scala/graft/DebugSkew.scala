package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Measured skew A/B (VERDICT r4 #7): a deliberately hot join key (90%
  * of fact rows collapse onto one key) driven through a shuffle
  * sort-merge join with AQE skew-join splitting ON vs OFF, on the same
  * data, same session shape. Prints warm seconds for both.
  *
  * Why a JOIN and not an aggregation: Spark's map-side partial
  * aggregation already neutralizes key skew for algebraic aggregates
  * (a hot key reaches the reducer as <= one partial row per map task),
  * so a salted-vs-plain agg A/B would measure noise. The shuffle join
  * has no such defense — the hot key's whole fact slice lands in one
  * task unless AQE splits it. [[graft.operators.Analytics.saltedAgg]]'s
  * niche is HOLISTIC aggregation state (collect_list, exact
  * percentile buffers), not algebraic sums.
  *
  * Usage: runMain graft.DebugSkew <sfDir> [fatness]
  */
object DebugSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val fat = if (args.length > 1) args(1).toInt else 8
    val spark = GraftSession.local()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // sf-scale hot partitions are tens of MB, not the 256 MB default
    // production threshold — scale the knobs down so the demo exercises
    // the same code path the big cluster would
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

    val ev = Tables.load(spark, sfDir, "events")
    // 90% of rows collapse onto key 0; payload fattened with
    // INCOMPRESSIBLE bytes (distinct sha2 chunks) — skew detection
    // reads compressed map-output sizes, so a repeated-string payload
    // compresses below the skew threshold and hides the hot partition
    val left = ev.select(
      when(pmod(col("user_id"), lit(10)) =!= 0, lit(0L))
        .otherwise(col("user_id")).as("k"),
      col("value"),
      concat((1 to fat).map(i =>
        sha2(concat(col("props"), col("event_id").cast("string"), lit(i)), 256)): _*)
        .as("payload"))
    // the dim side must reach the join as Sort(ShuffleStage) — an
    // aggregate between sort and shuffle breaks OptimizeSkewedJoin's
    // pattern match and silently disables skew handling (measured:
    // a groupBy-built dim never triggered the split)
    val right = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("k"), col("c_acctbal").as("dim_payload"))

    def run(skewOn: Boolean): Double = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = left.hint("merge").join(right, "k")
          .groupBy()
          .agg(sum(col("value") * col("dim_payload")).as("x"),
            sum(length(col("payload"))).as("bytes"))
        df.collect()
        val dt = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan.toString
        println(s"[skew] skewOn=$skewOn planHasSkew=${plan.contains("skew=true")} " +
          s"isFinal=${plan.contains("isFinalPlan=true")}")
        if (sys.env.contains("SPARK_GRAFT_SKEW_DUMP")) println(plan)
        dt
      }
      once() // cold/codegen
      once() // warm — reported
    }
    if (sys.env.contains("SPARK_GRAFT_SKEW_DEBUG"))
      spark.sparkContext.setLogLevel("DEBUG")
    val off = run(skewOn = false)
    val on = run(skewOn = true)
    println(f"[skew] sf=$sfDir fat=$fat aqeSkewOff=$off%.2f s aqeSkewOn=$on%.2f s speedup=${off / on}%.2fx")
    spark.stop()
  }
}
