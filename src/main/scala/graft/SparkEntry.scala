package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 gets a `queries` entry; where the
  * semantics are SQL-expressible, a matching DuckDB oracle in `oracleSql`
  * (same column names — the driver hash-compares after sorting columns by
  * name). Non-SQL-expressible operators (stateful folds, LSH) get rows-only
  * checks.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TradeAggregates.windowAgg5m(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_a1_window_agg_5m" -> ((s, d) => TradeAggregates.windowAgg5m(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_a1_window_agg_5m" -> TradeAggregates.windowAgg5mSql
  )
}
