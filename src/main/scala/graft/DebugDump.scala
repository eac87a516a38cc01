package graft
import java.nio.file.{Files, Paths}

/** Subset correctness dump for fast local iteration: like [[Verify]]
  * but only for the named queries, so `tools/check.py` can gate one
  * new operator without replaying the whole inventory.
  * Usage: runMain graft.DebugDump <sfDir> <outDir> <name> [more...]
  */
object DebugDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    val names = args.drop(2)
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
