package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every declared operator's query + oracle from the per-module
  * registries under graft.queries.
  */
object SparkEntry {

  private def allDefs: Map[String, QueryDef] =
    RelationalQueries.defs ++ ScalarQueries.defs ++ EventQueries.defs ++
      PipelineQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      TextQueries.defs ++ MultimodalQueries.defs ++ UdfQueries.defs ++
      ApproxQueries.defs ++ SourceQueries.defs ++ ProfilingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs("q20_join_revenue_by_nation").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.split(allDefs)._1

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    QueryDef.split(allDefs)._2
}
