package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Ann, Curation, Dedup, IncrementalDedup, Multimodal, Relational, TextOps}
import graft.cdc.CdcQueries
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** All implemented capabilities, one Q per SURVEY.md §2 row. */
  def registry: Seq[Q] =
    Relational.all ++ CdcQueries.all ++ graft.cdc.Router.all ++
      graft.cdc.ChangelogAgg.all ++ Dedup.all ++ IncrementalDedup.all ++
      TextOps.all ++ Curation.all ++ Ann.all ++ Multimodal.all ++
      Streams.all ++ graft.sources.Formats.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5MultiJoin.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
