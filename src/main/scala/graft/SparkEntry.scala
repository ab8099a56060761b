package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every declared operator query (SURVEY.md §2.2/§2.3);
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash-compare gate.
  * Query modules live under `graft.queries`.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q33 runs the whole freshening engine end-to-end (registry attach →
    * policy predicate → scorer → newest-wins merge) — the most
    * representative single smoke check this library has. */
  def entry(spark: SparkSession): DataFrame =
    queries("q33_freshen_merged")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.LlmOps.queries ++
      graft.queries.Freshen.queries ++ graft.queries.Extended.queries ++
      graft.queries.Pipeline.queries ++ graft.queries.Curation.queries ++
      graft.queries.Scale.queries ++ graft.queries.Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.LlmOps.oracleSql ++
      graft.queries.Freshen.oracleSql ++ graft.queries.Extended.oracleSql ++
      graft.queries.Pipeline.oracleSql ++ graft.queries.Curation.oracleSql ++
      graft.queries.Scale.oracleSql ++ graft.queries.Analytics.oracleSql
}
