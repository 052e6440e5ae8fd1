package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Corpus, Dedup, Etl, Graph, Multimodal, Relational, Sampling, Similarity, TextAnalysis, Warehouse}
import graft.streaming.Streaming

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each module contributes (queries, oracleSql) pairs; keys must match
  * and result column names must match the oracle's aliases exactly
  * (the driver sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Etl.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Sampling.queries ++ Streaming.queries ++ Corpus.queries ++
      Warehouse.queries ++ Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Etl.oracleSql ++ TextAnalysis.oracleSql ++
      Dedup.oracleSql ++ Similarity.oracleSql ++ Multimodal.oracleSql ++
      Sampling.oracleSql ++ Streaming.oracleSql ++ Corpus.oracleSql ++
      Warehouse.oracleSql ++ Graph.oracleSql
}
