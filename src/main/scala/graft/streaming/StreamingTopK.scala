package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming top-k-per-key maintenance (S26 depth): the continuously
  * maintained leaderboard/cache a pipeline keeps per stratum — "the k
  * best-scored documents per source so far" — via `flatMapGroupsWithState`
  * with the current top-k list as state.
  *
  * The state fold is ORDER-INDEPENDENT: "insert then truncate to the k
  * best under the (score DESC, id ASC) total order" is a commutative
  * idempotent fold over distinct items, so the final leaderboard is the
  * batch answer no matter how arrival interleaves across micro-batches —
  * which is what makes the result hash-gateable against a plain
  * `row_number()` batch oracle.
  *
  * Scale: state is EXACTLY k (id, score) pairs per key — bounded by
  * k·|keys| regardless of stream length; each batch's work is one local
  * merge per touched key. A `flush` row emits the key's final board (the
  * bounded-replay analogue of a terminal watermark sweep); real
  * deployments would instead emit on every update (Update mode) or on a
  * processing-time cadence.
  */
object StreamingTopK {

  /** Input row; `flush = true` rows carry no item, they only trigger
    * emission for their key. */
  case class Scored(key: String, id: Long, score: Long, flush: Boolean)

  /** One leaderboard row, emitted at flush. */
  case class TopEntry(key: String, rank: Int, id: Long, score: Long)

  def topK(events: Dataset[Scored], k: Int): Dataset[TopEntry] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[List[(Long, Long)], TopEntry](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, batch, state: GroupState[List[(Long, Long)]]) =>
          var cur = state.getOption.getOrElse(Nil)
          var doFlush = false
          batch.foreach { e =>
            if (e.flush) doFlush = true
            else cur = ((e.score, e.id) :: cur)
              .sortBy { case (s, id) => (-s, id) }.take(k)
          }
          state.update(cur)
          if (doFlush)
            cur.zipWithIndex.iterator.map { case ((s, id), i) =>
              TopEntry(key, i + 1, id, s) }
          else Iterator.empty
      }
  }
}
