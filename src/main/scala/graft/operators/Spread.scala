package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Scan-parallelism repair for compute-heavy fan-out stages.
  *
  * The bench/test parquet inputs are single files with ONE row group
  * (TESTDATA.md), so every scan is exactly one task no matter the core
  * count — `maxPartitionBytes`/`minPartitionNum` cannot split below a row
  * group. Any operator whose scan stage does real per-row compute (L-gram
  * explode + hash, per-position fingerprints, per-vector dot products)
  * therefore runs that compute on ONE core of 32 — the q309 bug class
  * (single-input-split inheritance under a fan-out) at the operator level;
  * round-12 forensics measured 7.5× on q309 alone.
  *
  * [[spread]] round-robin repartitions to the session default parallelism
  * — but ONLY when the frame's existing partitioning is narrower. The
  * check reads the planned partition count (file splits for a scan; no job
  * runs), so at real scale, where any 100 TB table scans as thousands of
  * splits, the condition is false at plan time and NO exchange enters the
  * plan — the helper is a provable no-op exactly where an extra pass over
  * the payload would be expensive. Where it does fire, the exchanged bytes
  * are the pre-fan-out base (bounded by the input slice), never the
  * exploded stream.
  *
  * Round-robin (not keyed): perfect balance, no synthetic-key collision
  * skew (guide: a keyed repartition on few distinct values leaves holes),
  * and Spark's sort-before-repartition keeps the row→partition assignment
  * deterministic under task retry.
  *
  * Scan-side frames only: `df.rdd.getNumPartitions` is a plan-time no-op
  * only for exchange-free inputs (scans, scans+filters). On a frame
  * containing shuffles under AQE, materializing the RDD executes its
  * query stages (runs jobs) just to read the partition count — so
  * [[spread]] GUARDS on the optimized logical plan (a pure plan walk, no
  * jobs) and returns the frame untouched unless it is a narrow
  * scan/filter/project pipeline over leaves. That makes it safe to call
  * from shared operators whose callers sometimes pass joined frames. */
object Spread {
  /** True when the optimized plan is narrow (no exchange will be planned
    * below it), so reading the RDD partition count runs no job. */
  private def narrowScan(df: DataFrame): Boolean = {
    def ok(p: LogicalPlan): Boolean = p match {
      case _: Project | _: Filter | _: SubqueryAlias | _: Generate =>
        p.children.forall(ok)
      case _: LeafNode => true
      case _ => false
    }
    ok(df.queryExecution.optimizedPlan)
  }

  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (narrowScan(df) && df.rdd.getNumPartitions < want) df.repartition(want)
    else df
  }
}
