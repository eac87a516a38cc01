package graft

/** Print the formatted physical plan of a named query.
  * Usage: runMain graft.DebugExplain <sfDir> <queryName>
  */
object DebugExplain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cpus = 4)
    println(SparkEntry.queries(args(1))(spark, args(0))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
