package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 interval maintenance: the type-2 dimension build
  * ([[graft.operators.Temporal.scd2]]) computed INCREMENTALLY over a CDC
  * event stream — closed validity intervals emit the moment the attribute
  * changes; the open (current) interval emits on flush. A warehouse keeps
  * dimension history live this way instead of rebuilding it nightly.
  *
  * Semantics are IDENTICAL to the batch operator (a new interval opens on
  * every attribute change in (ts, id) order; `valid_to_us` = next
  * interval's start, NULL = current), so a bounded replay's output
  * hash-matches the batch oracle — the determinism contract all the
  * streaming queries share. Within a batch the group's events sort by
  * (ts_us, eid); across batches correctness requires per-entity
  * non-decreasing ts delivery (time-sliced staged files do; a general
  * source would watermark-buffer first). Closed intervals are emitted
  * exactly once, in Append mode, as soon as they close — the streaming
  * win over the batch window plan.
  *
  * Scale: state per entity is ONE open run (attr, run_id, valid_from,
  * n_events) — constant-size, bounded by entity count; each batch's work
  * ∝ batch size. No shuffle beyond the entity grouping.
  */
object StreamingScd2 {

  /** Input row; `flush = true` rows only emit the open interval. */
  case class Scd2Event(entity_id: Long, ts_us: Long, eid: Long, attr: String,
      flush: Boolean)

  /** The one open run being extended. */
  case class Scd2State(run_id: Long, attr: String, valid_from_us: Long,
      n_events: Long)

  /** One validity interval (valid_to_us None = still current). */
  case class Scd2Result(entity_id: Long, run_id: Long, attr: String,
      valid_from_us: Long, valid_to_us: Option[Long], n_events: Long)

  def scd2(events: Dataset[Scd2Event]): Dataset[Scd2Result] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.entity_id)
      .flatMapGroupsWithState[Scd2State, Scd2Result](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id, batch, state: GroupState[Scd2State]) =>
          // (ts, eid) order within the batch; flush sorts after everything
          val sorted = batch.toSeq.sortBy(e => (e.flush, e.ts_us, e.eid))
          var cur = state.getOption
          val emit = Seq.newBuilder[Scd2Result]
          sorted.foreach { e =>
            if (e.flush) {
              cur.foreach(c => emit += Scd2Result(id, c.run_id, c.attr,
                c.valid_from_us, None, c.n_events))
              cur = None
            } else cur match {
              case Some(c) if c.attr == e.attr =>
                cur = Some(c.copy(n_events = c.n_events + 1))
              case Some(c) =>
                // attribute changed: the open run closes AT the new start
                emit += Scd2Result(id, c.run_id, c.attr, c.valid_from_us,
                  Some(e.ts_us), c.n_events)
                cur = Some(Scd2State(c.run_id + 1, e.attr, e.ts_us, 1L))
              case None =>
                cur = Some(Scd2State(1L, e.attr, e.ts_us, 1L))
            }
          }
          cur match {
            case Some(c) => state.update(c)
            case None => state.remove()
          }
          emit.result().iterator
      }
  }
}
