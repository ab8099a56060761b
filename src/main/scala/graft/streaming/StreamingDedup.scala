package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental exact deduplication over a document stream: the first
  * micro-batch in which a content hash appears wins, and exactly one
  * representative (the smallest doc id within that batch) is emitted for
  * it; every later arrival of the same hash — same batch or any later
  * batch — is silently dropped. This is the streaming form of
  * [[graft.llmops.Dedup.exactDedup]]: a crawl pipeline ingesting shards
  * continuously dedups against everything already accepted without
  * re-scanning the corpus.
  *
  * Semantics are deterministic given a deterministic batch sequence: the
  * winner depends only on WHICH batch first contains the hash and the min
  * id within that batch — not on row order inside a batch or on timing.
  *
  * Scale: state is one boolean per distinct content hash, hash-partitioned
  * across executors — the streaming analogue of the exact-dedup shuffle
  * key (the 64-hex digest, never the document body). Per-batch work is
  * one `groupByKey` shuffle of (hash, id) pairs, proportional to the
  * batch, not the corpus. (The digest itself is computed with `sha2` in
  * the scan projection upstream.)
  */
object StreamingDedup {

  /** Input: content hash (e.g. sha2-256 of the text) + document id. */
  case class DocArrival(sha: String, id: Long)

  /** Emitted once per distinct hash: the accepted representative and the
    * 0-based micro-batch ordinal it arrived in (from the caller's stage
    * numbering, carried on the row). */
  case class Accepted(sha: String, keep_id: Long, first_batch: Long)

  /** Arrival row tagged with its staged batch ordinal. */
  case class TaggedArrival(sha: String, id: Long, batch: Long)

  /** First-seen dedup across micro-batches. `seen` state never expires —
    * a production deployment bounds it with a TTL timeout or a compacted
    * state store; the operator's contract (first batch wins) is the same. */
  def firstSeen(arrivals: Dataset[TaggedArrival]): Dataset[Accepted] = {
    import arrivals.sparkSession.implicits._
    arrivals
      .groupByKey(_.sha)
      .flatMapGroupsWithState[Boolean, Accepted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sha, batch, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // min (batch, id): with one file per trigger every row here has
            // the same batch ordinal, but taking the pairwise min keeps the
            // contract honest if a trigger ever folds two files together
            val best = batch.map(a => (a.batch, a.id)).min
            Iterator.single(Accepted(sha, best._2, best._1))
          }
      }
  }
}
