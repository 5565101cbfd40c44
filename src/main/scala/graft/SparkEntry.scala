package graft

import graft.queries.{AnalystQueries, CleaningQueries, EngineQueries, EtlQueries, ExportQueries, GraphSketchQueries, IngestQueries, LayoutQueries, PipelineQueries, Q, RelationalQueries, ResolverQueries, SelectionQueries, StreamingQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator from SURVEY §2 (plus the training-data
  * pipeline extensions) is exposed as a named query over the synthetic
  * tables; queries with a DuckDB-expressible equivalent also declare
  * oracle SQL for the driver's hash-match correctness gate.
  */
object SparkEntry {

  val allDecls: Seq[Q.Decl] =
    RelationalQueries.decls ++ EngineQueries.decls ++ PipelineQueries.decls ++
      CleaningQueries.decls ++ ExportQueries.decls ++ ResolverQueries.decls ++
      IngestQueries.decls ++ EtlQueries.decls ++ StreamingQueries.decls ++
      SelectionQueries.decls ++ LayoutQueries.decls ++ GraphSketchQueries.decls ++
      AnalystQueries.decls

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDecls.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDecls.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDecls.collect { case Q.Decl(n, _, Some(sql)) => n -> sql }.toMap
}
