package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Similarity search over the `embeddings` table (SURVEY.md §2):
  * exact cosine top-k as the correctness baseline, random-hyperplane
  * LSH bucketing as the scale path.
  *
  * == Scale design ==
  * Brute force is O(Q×N): the query set is broadcast (small by
  * definition), so the corpus is scanned once with no shuffle, and
  * top-k is a per-query partial aggregate. At 100 TB the corpus side
  * stays partition-parallel; the LSH variant replaces the full cross
  * product with a bucket-equality join whose keys are uniform by
  * construction (signs of random projections).
  */
object Similarity {

  private val K = 5          // neighbors returned per query
  private val NQ = 10        // query set: vec_id < NQ
  private val PLANES = 8     // random hyperplanes → 256 buckets

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        expr("sqrt(aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v))").as("nrm"))

  private val dotExpr =
    "aggregate(zip_with(q.embedding, c.embedding, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"

  /** Exact cosine top-k: broadcast query set × corpus scan, then
    * row_number ≤ k per query with a vec_id tiebreak.
    */
  def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < NQ).alias("q")
    val c = e.alias("c")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c, col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (expr(dotExpr) / (col("q.nrm") * col("c.nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Random-hyperplane LSH ANN: signature bit j = sign(v·rⱼ) for 8
    * deterministic pseudo-random planes (components derived from
    * (j·73 + d·179) mod 97 — pure arithmetic, engine-independent);
    * candidates share the full 8-bit bucket, then exact cosine top-k
    * within the bucket. Trades recall for replacing the cross join
    * with a bucket-equality join.
    */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val bucketExpr =
      s"""aggregate(sequence(0, ${PLANES - 1}), 0L, (acc, j) ->
         |  acc | shiftleft(CASE WHEN
         |    aggregate(sequence(0, size(embedding) - 1), 0D, (a, d) ->
         |      a + CAST(element_at(embedding, d + 1) AS DOUBLE) *
         |          (CAST((j*73 + d*179) % 97 AS DOUBLE)/97.0 - 0.5)) > 0D
         |    THEN 1L ELSE 0L END, j))""".stripMargin
    val e = emb(s, dir).withColumn("bucket", expr(bucketExpr))
    val q = e.filter(col("vec_id") < NQ).alias("q")
    val c = e.alias("c")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c,
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (expr(dotExpr) / (col("q.nrm") * col("c.nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> annBruteforce,
    "ann_lsh" -> annLsh)

  val oracles: Map[String, String] = Map.empty
}
