package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

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

  /** Write `df` Z-order-clustered on two 16-bit keys: rows range-partition
    * and sort by the Morton code `zorder2(xCol, yCol)` (a native codegen
    * expression), so each output FILE covers a compact z-range — i.e. a
    * tight rectangle in (x, y). That is what makes parquet row-group /
    * file min-max stats prune scans with a predicate on EITHER column
    * (the Delta/Iceberg Z-ORDER rewrite, as a plain write helper). `files`
    * controls the target file count — on a cluster, pick it so files land
    * near the table format's target size. Columns must already be masked
    * into [0, 65536). */
  def writeZordered(df: DataFrame, path: String, xCol: String, yCol: String,
      files: Int): Unit =
    df.withColumn("__z", GraftFunctions.zorder2(col(xCol), col(yCol)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max) of a column over a parquet dir — the zone-map
    * observable the z-order specs assert tightness on (ONE Spark pass,
    * grouped by input file). */
  def fileRanges(spark: SparkSession, path: String, c: String): Seq[(Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col(c).cast("long")).as("lo"), max(col(c).cast("long")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
}
