package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, EngineQueries, GeoQueries, ScalarQueries, SimilarityQueries, TextQueries, TimeSeriesQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one implemented operator from SURVEY.md §2
  * (or a beyond-reference training-data-pipeline operator); [[oracleSql]]
  * holds the equivalent DuckDB SQL the driver hash-compares against at
  * sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The whole §3.1 lifecycle: QuerySpec JSON → cohort resolution →
    * windowed scan → broadcast semi-join → KPI/delta aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("cohort_analysis_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchQueries.defs ++ TimeSeriesQueries.defs ++ TextQueries.defs ++
      SimilarityQueries.defs ++ GeoQueries.defs ++ ScalarQueries.defs ++
      EngineQueries.defs ++ AnalyticsQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    TpchQueries.oracles ++ TimeSeriesQueries.oracles ++ TextQueries.oracles ++
      SimilarityQueries.oracles ++ GeoQueries.oracles ++ ScalarQueries.oracles ++
      EngineQueries.oracles ++ AnalyticsQueries.oracles
}
