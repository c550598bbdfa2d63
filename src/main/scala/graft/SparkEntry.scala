package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticQueries, DedupQueries, GraphQueries, MRQueries, MultimodalQueries, OrderedQueries, PipelineQueries, Relational, SeriesQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each query module contributes `Seq[QDef]` (Spark formulation +
  * DuckDB oracle SQL); this object flattens them into the
  * `queries` / `oracleSql` maps the driver consumes.
  */
object SparkEntry {

  private lazy val all: Seq[QDef] =
    Relational.defs ++ OrderedQueries.defs ++ AnalyticQueries.defs ++
      TextQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      MultimodalQueries.defs ++ MRQueries.defs ++ PipelineQueries.defs ++
      SeriesQueries.defs ++ GraphQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
