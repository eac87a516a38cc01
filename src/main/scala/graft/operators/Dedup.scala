package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators over `documents` / `embeddings`
  * (SURVEY.md §2). Exact + four near-dup families, all as declarative
  * column math (the hashing is splittable arithmetic over xxhash64 —
  * no UDFs, stays inside whole-stage codegen).
  *
  * == Scale design ==
  * - exact: hash-groupBy on normalized text — one shuffle of
  *   (hash, id), map-side combinable.
  * - ngram-jaccard: the candidate generator joins on shingle ids; at
  *   100 TB you bound it with MinHash/LSH below (this operator is the
  *   exact verifier both share).
  * - minhash-lsh: b=8 bands × r=4 rows over k=32 minhashes; shuffle
  *   keys are (band, bandhash) — uniformly distributed by
  *   construction, so no skew; bucket-local self-joins bound the
  *   candidate set.
  * - simhash: 64-bit signature, banded into 4×16-bit chunks (any
  *   equal chunk ⇒ candidate ⇒ exact Hamming verify ≤ threshold —
  *   guaranteed recall for distance < 4·... candidates at distance ≤3
  *   chunks differ).
  * - embedding: brute-force cosine pairs is the correctness baseline;
  *   the LSH-bucketed scale path is Similarity.annLsh.
  */
object Dedup {

  private val P = 2147483647L // 2^31-1, Mersenne prime for (a·h+b) mod p

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Distinct word-bigram shingles per doc. */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      array_distinct(expr(
        "zip_with(slice(split(text,' '),1,size(split(text,' '))-1)," +
          "slice(split(text,' '),2,size(split(text,' '))-1)," +
          "(a,b) -> concat(a,' ',b))")).as("ngs"))
      .filter(size(col("ngs")) > 0)

  // ----------------------------------------------------------- exact
  /** Exact dedup on normalized text (trim + collapse whitespace):
    * keep the min doc_id per group. The corpus has no planted exact
    * dups, so every group is a singleton here — the spec asserts the
    * collapse on synthetic dup rows.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(regexp_replace(trim(col("text")), " +", " ").as("norm_text"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))
      .orderBy(col("keeper_id"))

  val dedupExactSql: String =
    """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY regexp_replace(trim(text), ' +', ' ', 'g')
      |ORDER BY keeper_id""".stripMargin

  // ---------------------------------------------------- ngram-jaccard
  /** Exact n-gram Jaccard near-dup pairs: unnest distinct bigram
    * shingles, join on shingle, |∩|/|∪| ≥ 0.3. Jaccard is an exact
    * int/int division ⇒ engine-stable doubles.
    */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val g = shingled(s, dir)
      .select(col("doc_id"), size(col("ngs")).as("n"), explode(col("ngs")).as("ng"))
    val a = g.alias("a"); val b = g.alias("b")
    a.join(b, col("a.ng") === col("b.ng") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("i"))
      .select(col("doc_a"), col("doc_b"),
        (col("i") * 1.0 / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val dedupNgramJaccardSql: String =
    """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]))) AS ng
      |  FROM w WHERE len(ws) > 1),
      |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |  FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT doc_a, doc_b, i * 1.0 / (s1.n + s2.n - i) AS jaccard
      |FROM inter JOIN sz s1 ON s1.doc_id = doc_a JOIN sz s2 ON s2.doc_id = doc_b
      |WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.3
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------ minhash-lsh
  /** MinHash signatures (k=32 permutations (aᵢ·h+bᵢ) mod 2³¹-1 over
    * xxhash64 shingle ids) → 8 LSH bands of 4 → bucket self-join →
    * exact-Jaccard verification ≥ 0.3. All arithmetic stays below 2⁶²
    * so ANSI-mode long math never overflows. Rows-only (xxhash64 has
    * no DuckDB twin); the spec asserts recall vs dedupNgramJaccard.
    */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sigExpr =
      """transform(sequence(0, 31), i ->
        |  array_min(transform(hs, h -> pmod(
        |    pmod(1103515245L * (CAST(i AS BIGINT) + 1L), 2147483647L) * h +
        |    pmod(12345L * (CAST(i AS BIGINT) + 1L) + 987654321L, 2147483647L),
        |    2147483647L))))""".stripMargin
    val sigs = shingled(s, dir)
      .select(col("doc_id"), col("ngs"),
        expr("transform(ngs, x -> pmod(xxhash64(x), 2147483647L))").as("hs"))
      .select(col("doc_id"), col("ngs"), expr(sigExpr).as("sig"))
    val banded = sigs.select(col("doc_id"), col("ngs"),
      explode(expr(
        "transform(sequence(0, 7), b -> struct(b AS band, hash(slice(sig, b*4 + 1, 4)) AS bh))"))
        .as("bb"))
      .select(col("doc_id"), col("ngs"), col("bb.band"), col("bb.bh"))
    val a = banded.alias("a"); val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ngs").as("ngs_a"), col("b.ngs").as("ngs_b"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ngs_a"), col("ngs_b"))) * 1.0 /
          size(array_union(col("ngs_a"), col("ngs_b")))).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --------------------------------------------------------- simhash
  /** 64-bit SimHash: per bit j, sum ±1 over word-hash bits, bit set if
    * the sum is positive; candidates share any of 4×16-bit chunks,
    * verified by exact Hamming distance ≤ 16. Pure column math.
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val simExpr =
      """aggregate(sequence(0, 63), 0L, (acc, j) ->
        |  acc | shiftleft(CASE WHEN aggregate(hs, 0L, (s, h) ->
        |    s + CASE WHEN (shiftright(h, j) & 1L) = 1L THEN 1L ELSE -1L END) > 0L
        |    THEN 1L ELSE 0L END, j))""".stripMargin
    val sigs = docs(s, dir)
      .select(col("doc_id"),
        expr("transform(split(text, ' '), w -> xxhash64(w))").as("hs"))
      .select(col("doc_id"), expr(simExpr).as("simhash"))
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), c -> struct(c AS chunk, shiftright(simhash, c*16) & 65535L AS ch))"))
        .as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk"), col("cc.ch"))
    val a = chunked.alias("a"); val b = chunked.alias("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.ch") === col("b.ch")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------------------- embedding
  /** Embedding-cosine near-dup pairs (brute force, the correctness
    * baseline; the banded scale path is Similarity.annLsh). Cosine via
    * zip_with/aggregate fold — codegen'd, no UDF.
    */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        expr("sqrt(aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v))").as("nrm"))
    val a = e.alias("a"); val b = e.alias("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (expr("aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)")
          / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= 0.45)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embedding" -> dedupEmbedding)

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql)
}
