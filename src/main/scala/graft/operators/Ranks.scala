package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — dense 1-based rank over a TOTAL order,
  * computed as a distributed zip-with-index: a range repartition
  * (distributed sort), a per-partition row_number, and broadcast cumulative
  * partition offsets. No global single-partition window anywhere — the only
  * unpartitioned construct is a triangular join over one row per shuffle
  * partition. The generalization of the token dictionary's rank
  * (graft.llmops.Dedup.tokenDictionary), shared by any operator needing a
  * cluster-safe global rank (RFM scoring, percentile bucketing).
  *
  * Determinism: range partitions are totally ordered, so offset +
  * in-partition rank IS the global rank regardless of where the range
  * sampler places partition boundaries. The order columns must form a total
  * order (add a unique tie-breaker) or ranks of ties become
  * boundary-placement-dependent.
  */
object Ranks {

  /** Distributed INCLUSIVE prefix sum of `valueCol` under a total `order` —
    * the scan primitive behind CDF walks (threshold sweeps, cumulative
    * gains): same two-pass shape as [[globalRank]] (range repartition →
    * per-partition window scan → broadcast per-partition offsets via the
    * metadata triangular join), so no single-partition window ever
    * materializes. The order columns must form a total order. */
  def prefixSum(df: DataFrame, valueCol: String, sumCol: String,
      order: Column*): DataFrame =
    prefixSums(df, Seq(valueCol -> sumCol), order: _*)

  /** Multi-column [[prefixSum]]: every (valueCol → sumCol) pair scans under
    * ONE shared range partitioning, window pass, and offset broadcast —
    * a k-column sweep costs one shuffle, not k. */
  def prefixSums(df: DataFrame, cols: Seq[(String, String)],
      order: Column*): DataFrame = {
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(nParts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = cols.foldLeft(parted) { case (acc, (v, out)) =>
      acc.withColumn(s"__ls_$out", sum(col(v)).over(w)) }
    val totals = parted.groupBy("__pid")
      .agg(cols.head match { case (v, out) => sum(col(v)).as(s"__tot_$out") },
        cols.tail.map { case (v, out) => sum(col(v)).as(s"__tot_$out") }: _*)
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(cols.head match { case (_, out) =>
          coalesce(sum(col(s"b.__tot_$out")), lit(0L)).as(s"__off_$out") },
        cols.tail.map { case (_, out) =>
          coalesce(sum(col(s"b.__tot_$out")), lit(0L)).as(s"__off_$out") }: _*)
    val joined = local.join(broadcast(offsets), "__pid")
    cols.foldLeft(joined) { case (acc, (_, out)) =>
      acc.withColumn(out, col(s"__ls_$out") + col(s"__off_$out"))
        .drop(s"__ls_$out", s"__off_$out")
    }.drop("__pid")
  }

  /** Per-GROUP dense 1-based rank for LOW-cardinality group keys — the
    * straggler shape `Window.partitionBy(key)` cannot survive at scale:
    * with k distinct keys each of the k tasks sorts N/k rows (round-12
    * audit: q312's event_type has 5 values, q235's nation 25). Built as
    * ONE global [[globalRank]]-style range sort over (key, order…) — each
    * key's run is contiguous under the total order, so its per-key rank is
    * the global rank minus the count of rows in all strictly-smaller keys
    * (a broadcast per-key offset). Parallelism stays the shuffle-partition
    * count regardless of key cardinality.
    *
    * The per-key offset build is a triangular join over the DISTINCT keys
    * (|K|² pairs) — metadata-scale exactly when this helper applies. A
    * HIGH-cardinality key (many small groups) should keep the plain keyed
    * window instead: it balances naturally and skips the extra pass.
    * Order columns must total-order rows WITHIN each key (unique
    * tie-breaker), same contract as [[globalRank]]. `keyCol` must be
    * NON-NULL: the offset equi-join and the `b.key < a.key` triangular
    * join both drop NULL keys, so NULL-key rows would silently vanish
    * from the output (where `Window.partitionBy` would rank them as
    * their own group) — coalesce a sentinel key first if NULLs are
    * possible. */
  def groupRank(df: DataFrame, keyCol: String, rankCol: String,
      order: Column*): DataFrame = {
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sortCols = col(keyCol) +: order
    val parted = df.repartitionByRange(nParts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val ranked = parted.withColumn("__rn",
      row_number().over(Window.partitionBy("__pid").orderBy(sortCols: _*))
        .cast("long"))
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    val kcnt = parted.groupBy(keyCol).agg(count(lit(1)).as("__kcnt"))
    val koff = kcnt.as("a")
      .join(kcnt.as("b"), col(s"b.$keyCol") < col(s"a.$keyCol"), "left")
      .groupBy(col(s"a.$keyCol").as(keyCol))
      .agg(coalesce(sum(col("b.__kcnt")), lit(0L)).as("__koff"))
    ranked.join(broadcast(offsets), "__pid").join(broadcast(koff), keyCol)
      .withColumn(rankCol, col("__rn") + col("__off") - col("__koff"))
      .drop("__pid", "__rn", "__off", "__koff")
  }

  def globalRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    // persist() pins ONE materialized range partitioning so ranks and
    // offsets provably come from the same sampled boundaries (see
    // tokenDictionary for the full rationale); released by the caller's
    // clearCache discipline
    val parted = df.repartitionByRange(nParts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val ranked = parted.withColumn("__rn",
      row_number().over(Window.partitionBy("__pid").orderBy(order: _*)).cast("long"))
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    ranked.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__rn") + col("__off"))
      .drop("__pid", "__rn", "__off")
  }
}
