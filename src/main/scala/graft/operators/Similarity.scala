package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{FloatVectorDot, GraftFunctions}
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
  * construction (signs of random projections). The inner loops run
  * through [[graft.functions.FloatVectorDot]] — a codegen'd Catalyst
  * expression — because Spark's higher-order `aggregate`/`zip_with`
  * evaluate interpreted and dominate O(pairs·dim) workloads.
  */
object Similarity {

  private val K = 5          // neighbors returned per query
  private val NQ = 10        // query set: vec_id < NQ
  private val PLANES = 8     // random hyperplanes → 256 buckets
  private val DIM = 64

  import org.apache.spark.sql.graftshim.GraftSqlShim

  private def dot(a: Column, b: Column): Column =
    GraftSqlShim.column(
      FloatVectorDot(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  private def emb(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.load(s, dir, "embeddings")
    e.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
  }

  /** Deterministic pseudo-random hyperplane j: component d is
    * ((j·73 + d·179) mod 97)/97 − 0.5.
    */
  private def plane(j: Int): Array[Float] =
    Array.tabulate(DIM)(d => (((j * 73 + d * 179) % 97) / 97.0 - 0.5).toFloat)

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
        (dot(col("q.embedding"), col("c.embedding")) / (col("q.nrm") * col("c.nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Random-hyperplane LSH ANN: signature bit j = sign(v·planeⱼ);
    * candidates share the full 8-bit bucket, then exact cosine top-k
    * within the bucket. Trades recall for replacing the cross join
    * with a bucket-equality join.
    */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val bucket = (0 until PLANES).map { j =>
      when(dot(col("embedding"), typedLit(plane(j))) > 0d, 1L << j).otherwise(0L)
    }.reduce(_ + _)
    val e = emb(s, dir).withColumn("bucket", bucket)
    val q = e.filter(col("vec_id") < NQ).alias("q")
    val c = e.alias("c")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c,
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (dot(col("q.embedding"), col("c.embedding")) / (col("q.nrm") * col("c.nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style ANN: a 16-cell coarse quantizer (deterministic
    * codebook: the vectors with vec_id < 16) assigns every vector to
    * its nearest centroid; queries probe their nprobe=2 nearest cells
    * and rank candidates by exact cosine. The corpus-side pass is one
    * typed map (16 dots per row); search shuffles only on cell ids.
    * The real-system upgrade is a trained k-means codebook — the
    * assignment/probe plumbing is identical.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val NPROBE = 2
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    def dotd(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { d += a(i).toDouble * b(i); i += 1 }
      d
    }
    def nrm(v: Array[Float]): Double = math.sqrt(dotd(v, v))
    val cbRows = e.filter(_._1 < 16).collect().sortBy(_._1)
      .map { case (id, v) => (id, v, nrm(v)) }
    require(cbRows.nonEmpty,
      "ann_ivf needs codebook vectors (vec_id < 16) in the embeddings table")
    val codebook = s.sparkContext.broadcast(cbRows)
    def cellsOf(v: Array[Float], n: Double, k: Int): Seq[Long] =
      codebook.value
        .map { case (cid, cv, cn) => (cid, dotd(v, cv) / (n * cn)) }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(k).map(_._1).toSeq
    val assigned = e.map { case (id, v) =>
      val n = nrm(v)
      (id, v, n, cellsOf(v, n, 1).head)
    }.toDF("vec_id", "embedding", "nrm", "cell")
    val probes = e.filter(_._1 < NQ).flatMap { case (id, v) =>
      val n = nrm(v)
      cellsOf(v, n, NPROBE).map(c => (id, v, n, c))
    }.toDF("q_id", "q_emb", "q_nrm", "cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(probes).join(assigned,
        probes("cell") === assigned("cell") && col("q_id") =!= col("vec_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> annBruteforce,
    "ann_lsh" -> annLsh,
    "ann_ivf" -> annIvf)

  /** DuckDB twin of the brute-force path: the dot product is a
    * sequential left-fold over per-element double products — the same
    * association order as FloatVectorDot, so cosines are bit-identical
    * and ranks match exactly. (annLsh stays rows-only: its bucketing
    * depends on float-literal plane components.)
    */
  val annBruteforceSql: String =
    """WITH e AS (SELECT vec_id, embedding, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))), (acc, v) -> acc + v)) AS nrm FROM embeddings),
      |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len(q.embedding)+1), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))), (acc, v) -> acc + v) / (q.nrm * c.nrm) AS cosine
      |  FROM e q, e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM p)
      |SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  val oracles: Map[String, String] = Map(
    "ann_bruteforce" -> annBruteforceSql)
}
