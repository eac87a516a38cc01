package graft

/** Ad-hoc profiling entry: times a named query N times in one session
  * (cold vs warm separates janino/codegen overhead from data time).
  * Usage: runMain graft.DebugTime <sfDir> <queryName> [reps]
  */
object DebugTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local()
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[debugtime] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
