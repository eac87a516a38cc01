package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // noop sink: forces full evaluation of every projected column
    // (count() would let Catalyst prune the actual computation away).
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    // Two passes: the first pays one-time janino/codegen compilation
    // (~0.5-1.5s per query — larger than the data time at sf0.1); the
    // second measures steady-state engine throughput. Both reported.
    val cold = SparkEntry.queries.map { case (name, fn) => name -> once(name, fn) }
    val warm = SparkEntry.queries.map { case (name, fn) => name -> once(name, fn) }
    def js(m: Map[String, Double]) =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (warm.nonEmpty) warm.values.sum else 0.0
    val coldTotal = if (cold.nonEmpty) cold.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(warm)},"cold_total":$coldTotal,"cold_queries":${js(cold)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
