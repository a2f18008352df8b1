package graft

import graft.analytics.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The real surface lives in graft.analytics.Catalog (one entry per
  * operator from SURVEY.md §2 + the training-data addenda), graft.core
  * (change-log algebra), graft.operators (filters/matchers/routers),
  * graft.sinks and graft.streaming (pipeline machinery).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Replicate the orders change-log to a snapshot and aggregate it —
    * exercises source, ordering, compaction and aggregation end-to-end.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_apply_then_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
