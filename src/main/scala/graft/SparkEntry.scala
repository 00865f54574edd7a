package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Coverage, DedupQueries, EventQueries, FuncsExtra, MultimodalQueries, PipelineQueries, PlanOps, PubMedQueries, Relational, ScaleDiag, SimilarityQueries, SqlApi, StatsExtra, TextQueries, TrainingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers a query here; SQL-expressible
  * ones also register DuckDB oracle SQL (column names aligned on both
  * sides — the driver sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TextQueries.keywordTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextQueries.queries ++ EventQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      PipelineQueries.queries ++ MultimodalQueries.queries ++
      Coverage.queries ++ PlanOps.queries ++ FuncsExtra.queries ++
      SqlApi.queries ++ StatsExtra.queries ++ ScaleDiag.queries ++
      PubMedQueries.queries ++ TrainingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextQueries.oracle ++ EventQueries.oracle ++
      DedupQueries.oracle ++ SimilarityQueries.oracle ++
      PipelineQueries.oracle ++ MultimodalQueries.oracle ++
      Coverage.oracle ++ PlanOps.oracle ++ FuncsExtra.oracle ++
      SqlApi.oracle ++ StatsExtra.oracle ++ ScaleDiag.oracle ++
      PubMedQueries.oracle ++ TrainingQueries.oracle
}
