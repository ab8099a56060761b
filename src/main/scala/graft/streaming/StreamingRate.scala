package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key rate-anomaly alerting (S26 depth): the volume monitor a
  * pipeline runs at ingest — "is this event type suddenly arriving at more
  * than twice its historical daily rate?" — via `flatMapGroupsWithState`
  * with one OPEN time window plus three trailing integers as state.
  *
  * Semantics: per key, tumbling windows close in window order; a window
  * closes when a LATER window's first row arrives (or a flush sentinel).
  * At close, the window is judged against the trailing mean of every
  * previously closed window by the exact integer cross-multiply
  * n·priorW > 2·priorTotal — no division, so the alert bit is
  * hash-gateable. A window split across micro-batches accumulates into the
  * open-window state; within a batch, contributions are folded in
  * (window-id) order, so arrival interleaving cannot change any emitted
  * row.
  *
  * Scale: state per key is FIVE longs (open window id + count, closed
  * window count + total, last closed window id) — O(|keys|) regardless
  * of stream length; each
  * batch's work is one local fold per touched key. Requires in-order
  * window DELIVERY across batches (the staged-replay contract; a real
  * deployment puts a watermark upstream to bound disorder) — a window id
  * at or below the last closed one, a flush aimed below the open window,
  * or a flush sentinel carrying a count, FAILS the query loudly rather
  * than silently corrupting the emitted stats.
  */
object StreamingRate {

  /** Pre-aggregated input: `n` events of `key` in window `win`;
    * `flush = true` rows only close the key's open window. */
  case class RateEvent(key: String, win: Long, n: Long, flush: Boolean)

  /** (open window id or -1, open count, closed windows, closed total,
    * last CLOSED window id or -1). `lastClosed` survives the open-window
    * reset, so the in-order contract holds ACROSS batches: after a close,
    * st.win is -1 and an older window arriving in a later batch would
    * otherwise pass the open-window check and silently reopen. */
  case class RateState(win: Long, n: Long, priorW: Long, priorTotal: Long,
      lastClosed: Long)

  /** One closed window with its verdict against the trailing mean. */
  case class RateAlert(key: String, win: Long, n_events: Long,
      prior_windows: Long, prior_total: Long, is_spike: Boolean)

  def alerts(events: Dataset[RateEvent]): Dataset[RateAlert] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[RateState, RateAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, batch, state: GroupState[RateState]) =>
          // fold this batch's contributions in window order (arrival order
          // within a micro-batch is not deterministic; window order is)
          val byWin = batch.toSeq.groupBy(_.win).toSeq
            .map { case (w, rs) =>
              val flushN = rs.filter(_.flush).map(_.n).sum
              require(flushN == 0L,
                s"flush sentinel for key=$key win=$w carries n=$flushN (must be 0)")
              (w, rs.filterNot(_.flush).map(_.n).sum, rs.exists(_.flush)) }
            .sortBy(_._1)
          var st = state.getOption.getOrElse(RateState(-1L, 0L, 0L, 0L, -1L))
          val out = Seq.newBuilder[RateAlert]
          def close(): Unit = if (st.win >= 0) {
            out += RateAlert(key, st.win, st.n, st.priorW, st.priorTotal,
              st.priorW > 0 && st.n * st.priorW > 2L * st.priorTotal)
            st = RateState(-1L, 0L, st.priorW + 1, st.priorTotal + st.n, st.win)
          }
          byWin.foreach { case (w, n, isFlush) =>
            // fold any real contribution first, then honor a flush
            if (n > 0L || !isFlush) {
              if (st.win == w) st = st.copy(n = st.n + n)
              else {
                // in-order window delivery is the contract; re-opening an
                // OLDER window — including one already CLOSED in a prior
                // batch, when st.win has reset to -1 — would silently emit
                // duplicate (key, win) rows with wrong trailing stats —
                // fail loudly instead
                require(st.win < 0 || w > st.win,
                  s"out-of-order window for key=$key: got win=$w after open win=${st.win}")
                require(w > st.lastClosed,
                  s"out-of-order window for key=$key: got win=$w after closed win=${st.lastClosed}")
                close(); st = st.copy(win = w, n = n)
              }
            }
            if (isFlush) {
              // a flush closes the OPEN window; one aimed below it (an
              // already-closed or never-opened older window) is a replay
              // bug, not a close request — fail loudly
              require(st.win < 0 || w >= st.win,
                s"flush for key=$key targets win=$w below open win=${st.win}")
              close()
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
