package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark-first builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
  * over the same parquet tables. Queries without an oracle get the
  * driver's weaker rows-only check.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** Assemble a registry fragment into the SparkEntry maps. */
  def split(defs: Map[String, QueryDef])
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) =
    (defs.map { case (k, d) => k -> d.build },
     defs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql })
}
