package graft

/** A/B the term-emission shapes feeding grouped term counts
  * (text_quality / text_tfidf): declarative explode(split) versus
  * typed flatMap — quantifies whether the SURVEY §8 generator
  * re-evaluation penalty (measured 45× for trigram transform arrays)
  * applies to plain split arrays. Usage: runMain graft.DebugTermEmit [sfDir]
  */
object DebugTermEmit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[termemit] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    time("explode_split") {
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)))
    }
    time("typed_flatmap") {
      docs.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, t) => t.split(" ", -1).iterator.map(w => (id, w)) }
        .toDF("doc_id", "w").groupBy("w").agg(count(lit(1)))
    }
    spark.stop()
  }
}
