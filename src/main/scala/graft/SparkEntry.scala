package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Extended, LayerC, Relational, Relational2, Relational3, Relational4, Relational5, Relational6}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2); each entry
  * that is SQL-expressible has a DuckDB oracle in `oracleSql` with
  * identical column names and a total ORDER BY on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++
      Relational4.queries ++ Relational5.queries ++ Relational6.queries ++
      LayerC.queries ++ Extended.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Relational2.oracle ++ Relational3.oracle ++
      Relational4.oracle ++ Relational5.oracle ++ Relational6.oracle ++
      LayerC.oracle ++ Extended.oracle
}
