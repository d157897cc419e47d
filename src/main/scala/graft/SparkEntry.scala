package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-area registries; every entry that is
  * SQL-expressible has a DuckDB oracle in `oracleSql` with identical
  * column names/aliases (the driver's compare is name-keyed).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.BaseQueries.queries ++
      graft.queries.ClusterQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.BaseQueries.oracleSql ++
      graft.queries.ClusterQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.VectorQueries.oracleSql ++
      graft.queries.EventQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql
}
