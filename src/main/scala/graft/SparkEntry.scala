package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 registers here as a
  * (SparkSession, sfDir) => DataFrame plus a DuckDB-equivalent oracle SQL.
  * Column names/types are aligned on both sides (driver hash-compares). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1RatioRank(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_ratio_rank" -> ((s, d) => Queries.q1RatioRank(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_ratio_rank" -> Queries.q1RatioRankSql
  )
}
