package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, Curate, Dedup, Geo, Ingest, Maintain, Multimodal, Similarity, TextOps, TpcH}
import graft.streaming.EventStreams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every SURVEY.md §2 key to a DataFrame builder taking
  * (session, sf-dir); `oracleSql` gives the DuckDB-equivalent SQL the
  * driver hash-compares against (omitted ⇒ rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ Geo.queries ++ TextOps.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ EventStreams.queries ++
      Curate.queries ++ Maintain.queries ++ Ingest.queries ++ TpcH.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ Geo.oracles ++ TextOps.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ EventStreams.oracles ++
      Curate.oracles ++ Maintain.oracles ++ Ingest.oracles ++ TpcH.oracles
}
