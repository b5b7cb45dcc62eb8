package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-area modules under `graft.queries`; each
  * key has an ANSI-SQL oracle in `oracleSql` where the semantics are
  * SQL-expressible (the driver runs it in DuckDB and hash-compares).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference README's canonical chained-join example transposed to
    * testdata (reference: README.md:26-75).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("j8_chain_multiway")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.ParityQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.CorpusQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.ParityQueries.oracleSql ++
      graft.queries.AnalyticsQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.CorpusQueries.oracleSql
}
