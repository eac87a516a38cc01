package graft

import org.apache.spark.sql.functions._

/** Sub-pipeline timing for the jaccard hotspot. */
object DebugParts {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = args(0)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[parts] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), array_distinct(expr(
        """CASE WHEN size(ws) >= 3 THEN
          |  transform(sequence(1, size(ws) - 2),
          |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1), ' ',
          |                element_at(ws, i + 2)))
          |ELSE array() END""".stripMargin)).as("ngs"))
    val g = sh.select(col("doc_id"), size(col("ngs")).as("n"), explode(col("ngs")).as("ng"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val gNoN = sh.select(col("doc_id"), explode(col("ngs")).as("ng"))
    val gRep = sh.repartition(32).select(col("doc_id"), size(col("ngs")).as("n"), explode(col("ngs")).as("ng"))
    import org.apache.spark.sql.Encoders
    val gFlat = docs.select(col("doc_id"), col("text")).as[(Long, String)](Encoders.tuple(Encoders.scalaLong, Encoders.STRING)).flatMap { case (id, t) =>
      val ws = t.split(' '); val set = scala.collection.mutable.LinkedHashSet[String]()
      var i = 0
      while (i + 2 < ws.length) { set += (ws(i) + " " + ws(i+1) + " " + ws(i+2)); i += 1 }
      set.iterator.map(ng => (id, set.size, ng))
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.STRING)).toDF("doc_id", "n", "ng")
    (1 to 2).foreach { rep =>
      time(s"shingled rep$rep") { noop(sh) }
      time(s"exploded rep$rep") { noop(g) }
      time(s"exploded-no-n rep$rep") { noop(gNoN) }
      time(s"exploded-repart rep$rep") { noop(gRep) }
      time(s"exploded-flatmap rep$rep") { noop(gFlat) }
      val a = g.alias("a"); val b = g.alias("b")
      val joined = a.join(b, col("a.ng") === col("b.ng") && col("a.doc_id") < col("b.doc_id"))
      time(s"join rep$rep") { noop(joined) }
      val agg = joined.groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb")).agg(count(lit(1)).as("i"))
      time(s"join+agg rep$rep") { noop(agg) }
    }
    spark.stop()
  }
}
