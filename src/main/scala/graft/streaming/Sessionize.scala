package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization (S26 depth): gap-based sessions per entity via
  * `flatMapGroupsWithState`, with the open session carried in state ACROSS
  * micro-batches — the canonical stateful-streaming shape Structured
  * Streaming's built-in windowed aggregations don't cover (session windows
  * keyed by activity gaps, closed only when a later event or an explicit
  * flush proves the gap).
  *
  * Semantics (deterministic, event-time only — no wall clock, no
  * watermark-value dependence): events of an entity, ordered by ts, belong
  * to one session while consecutive gaps are <= gapMs; a gap > gapMs closes
  * the session. A `flush` row (ts beyond every real event) closes whatever
  * is open without starting a session — the batch analogue of a final
  * watermark sweep, and what makes a bounded replay emit EVERY session.
  *
  * Scale: state is ONE open session (4 longs) per entity — bounded by
  * entity count, hash-partitioned; each batch's work is proportional to the
  * batch. Money sums accumulate in cents (the DECIMAL(18,2) contract every
  * oracle query uses) so emission order and float drift can't skew them.
  */
object Sessionize {

  /** Input row: `flush = true` rows only close; sums use `valueCents` =
    * value cast to DECIMAL(18,2), in cents. */
  case class SessionEvent(entity_id: Long, ts: Long, valueCents: Long, flush: Boolean)

  /** One closed session. */
  case class Session(entity_id: Long, session_start: Long, session_end: Long,
      n_events: Long, sum_cents: Long)

  /** Open-session state carried between micro-batches. */
  case class Open(start: Long, end: Long, n: Long, cents: Long)

  /** Sessionize a (possibly multi-micro-batch) stream of [[SessionEvent]].
    * Emits each session exactly once, when closed. Within a batch the
    * group's events are sorted by ts; ACROSS batches correctness requires
    * the source to deliver an entity's events in non-decreasing ts order
    * batch-over-batch (file sources staged oldest-first do; a general
    * shuffled source would buffer by watermark first). */
  def sessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.entity_id)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id, batch, state: GroupState[Open]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts, e.flush))
          val closed = Seq.newBuilder[Session]
          var open: Option[Open] = state.getOption
          sorted.foreach { e =>
            open match {
              case Some(o) if e.ts - o.end > gapMs =>
                closed += Session(id, o.start, o.end, o.n, o.cents)
                open = if (e.flush) None
                       else Some(Open(e.ts, e.ts, 1L, e.valueCents))
              case Some(o) =>
                // flush inside the gap window cannot happen (flush ts sits
                // beyond every event by construction) but degrades safely:
                // it just extends nothing
                if (!e.flush)
                  open = Some(Open(o.start, math.max(o.end, e.ts), o.n + 1, o.cents + e.valueCents))
              case None =>
                if (!e.flush) open = Some(Open(e.ts, e.ts, 1L, e.valueCents))
            }
          }
          open match {
            case Some(o) => state.update(o)
            case None => state.remove()
          }
          closed.result().iterator
      }
  }
}
