package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-located-join story for the 100 TB design
  * point (SURVEY.md §4): writing both sides of a recurring equi-join
  * bucketed (and sorted) by the join key lets Spark plan a sort-merge join
  * with NO shuffle exchange on either side; at petabyte scale the exchange
  * is the dominant cost, so recurring entity joins (orders⋈lineitem,
  * entity view⋈scores) should live bucketed.
  *
  * Buckets also bound per-task state for the freshen merge: a bucket is the
  * natural "partition-scoped read-union-rewrite" unit of the write-back job
  * (SURVEY.md §7 hard parts).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** True iff the physical plan of `df` contains a shuffle exchange —
    * bucketed co-located joins must not. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
