package graft

/** Print the formatted physical plan of one or more named queries.
  * Usage: runMain graft.DebugExplain <sfDir> <queryName> [more names...]
  */
object DebugExplain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cpus = 4)
    args.drop(1).foreach { name =>
      println(s"===PLAN=== $name")
      println(SparkEntry.queries(name)(spark, args(0))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
