package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship composite: the end-to-end training-data curation pass a
  * 100 TB corpus pipeline runs — quality gate → near-dup removal →
  * token accounting — built entirely from the engine's own operators
  * (TextOps.textQuality, Dedup.dedupNgramJaccard).
  *
  * Near-dup policy: from every verified near-dup pair (jaccard ≥ 0.3),
  * the higher doc_id is dropped — deterministic, keeps one exemplar
  * per pair chain anchored at the smallest id.
  *
  * At scale: the quality gate is a scan-side filter; the drop set is
  * tiny relative to the corpus (near-dup ids only) and broadcasts into
  * a left-anti join; token totals are one grouped pass.
  */
object Curate {

  def pipelineCurate(s: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.textQuality(s, dir)
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        col("stopword_ratio"), col("quality_score"))
    val dropIds = Dedup.dedupNgramJaccard(s, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    quality
      .filter(col("quality_score") >= 0.5)
      .join(broadcast(dropIds), Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** Oracle: same quality formula, same pair CTE, NOT EXISTS drop. */
  val pipelineCurateSql: String = {
    val stops = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH q AS (
       |  SELECT doc_id, n_chars,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(list_filter(string_split(text, ' '), w -> w IN ($stops))) * 1.0 / len(string_split(text, ' ')) AS stopword_ratio,
       |    (1.0 - len(list_filter(string_split(text, ' '), w -> w IN ($stops))) * 1.0 / len(string_split(text, ' ')))
       |      * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]')) * 1.0 / n_chars)
       |      * least(1.0, len(string_split(text, ' ')) / 64.0) AS quality_score
       |  FROM documents),
       |w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
       |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
       |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS ng
       |  FROM w WHERE len(ws) > 2),
       |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id
       |  JOIN sz za ON za.doc_id = a.doc_id JOIN sz zb ON zb.doc_id = b.doc_id
       |  WHERE zb.n * 10 >= za.n * 3 AND za.n * 10 >= zb.n * 3
       |  GROUP BY 1, 2),
       |drops AS (SELECT DISTINCT doc_b AS doc_id FROM inter
       |  JOIN sz s1 ON s1.doc_id = doc_a JOIN sz s2 ON s2.doc_id = doc_b
       |  WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.3)
       |SELECT q.doc_id, n_chars,
       |  CAST(n_tokens AS BIGINT) AS n_tokens, stopword_ratio, quality_score
       |FROM q
       |WHERE quality_score >= 0.5
       |  AND NOT EXISTS (SELECT 1 FROM drops d WHERE d.doc_id = q.doc_id)
       |ORDER BY q.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> pipelineCurate)

  val oracles: Map[String, String] = Map(
    "pipeline_curate" -> pipelineCurateSql)
}
