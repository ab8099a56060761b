package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-stratum ingestion quota: admit the first `quota`
  * documents of each stratum (source/domain/language) in arrival order,
  * drop everything after — the continuous form of the mixture caps
  * (graft.llmops.Corpus.capTokenBudget / capPerStratum): a crawl pipeline
  * enforcing "at most N docs of domain d" while shards stream in, without
  * re-scanning what was already admitted.
  *
  * Semantics are deterministic given a deterministic batch sequence:
  * admission order within a batch is (batch ordinal, id) — never iterator
  * order — and the running count carries across batches, so an engine
  * that forgot cross-batch state would admit `quota` per batch and fail
  * the hash gate.
  *
  * Scale: state is ONE long (the used count) per stratum, hash-partitioned
  * across executors; per-batch work is one groupByKey shuffle of
  * (stratum, id) pairs, proportional to the batch. A stratum at quota
  * keeps its single counter forever — bound total state by |strata|, not
  * by anything that grows with the stream.
  */
object StreamingQuota {

  /** Input row: stratum key, document id, staged batch ordinal. */
  case class QuotaArrival(stratum: String, id: Long, batch: Long)

  /** One row per admitted document: its stratum-wide admission rank
    * (1-based, contiguous across batches). */
  case class Admitted(stratum: String, id: Long, batch: Long, adm_rank: Long)

  def admitFirstN(arrivals: Dataset[QuotaArrival], quota: Int): Dataset[Admitted] = {
    require(quota > 0, s"quota must be positive, got $quota")
    import arrivals.sparkSession.implicits._
    arrivals
      .groupByKey(_.stratum)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (stratum, batch, state: GroupState[Long]) =>
          val used = state.getOption.getOrElse(0L)
          if (used >= quota) Iterator.empty
          else {
            // (batch, id) sort: with one file per trigger all rows share a
            // batch ordinal, but the explicit key keeps admission honest if
            // a trigger ever folds two staged files together
            val take = batch.toSeq.sortBy(a => (a.batch, a.id))
              .take(quota - used.toInt)
            state.update(used + take.size)
            take.iterator.zipWithIndex.map { case (a, i) =>
              Admitted(a.stratum, a.id, a.batch, used + i + 1)
            }
          }
      }
  }
}
