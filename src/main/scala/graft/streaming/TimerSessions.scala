package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** EVENT-TIME TIMERS on the `transformWithState` API: per-user idle-gap
  * sessionization where the ENGINE's timer service closes sessions — the
  * timer-driven complement of [[RunningBalance]]'s pure ValueState fold
  * (q295) and the built-in `session_window` (q284).
  *
  * Protocol (deterministic under the one-event-time-day-per-micro-batch
  * replay):
  *   - arriving rows extend the user's open session; if the new batch's
  *     earliest event is more than [[TimerSessions.GapUs]] after the open
  *     session's last event, the old session CLOSES ON ARRIVAL (emitted
  *     immediately) and a fresh one opens — so reactivation never waits
  *     on the timer service;
  *   - each update re-registers an event-time timer at last_us + gap
  *     (the previous timer, tracked in state, is deleted — exactly one
  *     live timer per user);
  *   - when the watermark passes a timer, [[Proc.handleExpiredTimer]]
  *     closes the IDLE session. Only each user's final session can end
  *     this way — every earlier one closes on arrival — so the oracle
  *     needs exactly one watermark fact: the final eviction watermark.
  *
  * Scale posture: state is one fixed-size session row + one timer per
  * user, in RocksDB; per batch each active user folds locally and writes
  * one state row. Stale timers (superseded by a later registration that
  * raced the delete) are ignored by comparing the expiry against the
  * live session's own deadline. */
object TimerSessions {
  case class In(user_id: Long, ts: java.sql.Timestamp, cents: Long)
  case class Sess(start_us: Long, last_us: Long, n: Long, cents: Long,
    timer_ms: Long)
  case class Out(user_id: Long, start_us: Long, last_us: Long,
    n_events: Long, cents: Long, closed_by: String)

  /** Idle gap: one event-time day (the replay's batch granularity). */
  val GapUs: Long = 86400000000L

  class Proc extends StatefulProcessor[Long, In, Out] {
    @transient private var state: ValueState[Sess] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Sess]("sess", Encoders.product[Sess],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      var n = 0L; var c = 0L
      var lo = Long.MaxValue; var hi = Long.MinValue
      rows.foreach { r =>
        n += 1L; c += r.cents
        val us = r.ts.getTime * 1000L
        if (us < lo) lo = us
        if (us > hi) hi = us
      }
      val prev = if (state.exists()) state.get() else null
      val (closed, sess) =
        if (prev == null) (None, Sess(lo, hi, n, c, 0L))
        else if (lo - prev.last_us > GapUs)
          (Some(Out(key, prev.start_us, prev.last_us, prev.n, prev.cents,
            "arrival")),
            Sess(lo, hi, n, c, 0L))
        else (None, Sess(prev.start_us, math.max(prev.last_us, hi),
          prev.n + n, prev.cents + c, 0L))
      if (prev != null && prev.timer_ms > 0L) getHandle.deleteTimer(prev.timer_ms)
      val timerMs = (sess.last_us + GapUs) / 1000L
      getHandle.registerTimer(timerMs)
      state.update(sess.copy(timer_ms = timerMs))
      closed.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Out] = {
      if (!state.exists()) return Iterator.empty
      val sess = state.get()
      // stale timer (a later registration superseded it): ignore
      if (expiredTimerInfo.getExpiryTimeInMs() < sess.timer_ms) Iterator.empty
      else {
        state.clear()
        Iterator.single(Out(key, sess.start_us, sess.last_us, sess.n,
          sess.cents, "timer"))
      }
    }
  }
}
