package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel tracking: the conversion funnel
  * ([[graft.operators.Temporal.funnel]]) computed INCREMENTALLY over a
  * stream, with each entity's partial match carried in state across
  * micro-batches — live conversion tracking instead of a nightly batch
  * recompute.
  *
  * Semantics are IDENTICAL to the batch operator (greedy earliest
  * completion: step i+1 matches the first qualifying event strictly after
  * step i's match), so a bounded replay's output hash-matches the batch
  * oracle — the determinism contract all the streaming queries share.
  * Within a batch the group's events sort by ts; across batches
  * correctness requires per-entity non-decreasing ts delivery (time-sliced
  * staged files do; a general source would watermark-buffer first). A
  * flush sentinel (ts beyond every event) emits the entity's final funnel
  * row exactly once.
  *
  * Scale: state is the matched-timestamp prefix — at most `steps.length`
  * longs per entity, bounded by entity count; each batch's work ∝ batch.
  */
object StreamingFunnel {

  /** Input row; `flush = true` rows only emit, never match. */
  case class FunnelEvent(entity_id: Long, ts_us: Long, etype: String, flush: Boolean)

  /** Matched step times so far (ascending, length = steps matched). */
  case class FunnelState(times: List[Long])

  /** Final funnel row for one entity (emitted on flush). */
  case class FunnelResult(entity_id: Long, times: Seq[Long], steps_done: Long,
      completed: Boolean)

  def funnel(events: Dataset[FunnelEvent], steps: Seq[String],
      maxSpanUs: Long): Dataset[FunnelResult] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.length
    events
      .groupByKey(_.entity_id)
      .flatMapGroupsWithState[FunnelState, FunnelResult](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id, batch, state: GroupState[FunnelState]) =>
          // ts order within the batch; flush sorts after every real event
          val sorted = batch.toSeq.sortBy(e => (e.flush, e.ts_us))
          var times = state.getOption.map(_.times).getOrElse(Nil)
          val emit = Seq.newBuilder[FunnelResult]
          sorted.foreach { e =>
            if (e.flush) {
              val done = times.length
              val completed = done == k && times.last - times.head <= maxSpanUs
              emit += FunnelResult(id, times, done.toLong, completed)
              times = Nil
            } else if (times.length < k && e.etype == steps(times.length) &&
                (times.isEmpty || e.ts_us > times.last)) {
              times = times :+ e.ts_us
            }
          }
          val out = emit.result()
          if (out.nonEmpty) state.remove() else state.update(FunnelState(times))
          out.iterator
      }
  }
}
