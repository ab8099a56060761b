package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Arbitrary stateful processing on the `transformWithState` API (Spark
  * 4's StatefulProcessor, the successor of flatMapGroupsWithState): a
  * per-user RUNNING BALANCE — cumulative event count and cumulative
  * cents — carried across micro-batches in a typed ValueState.
  *
  * Scale posture: state is ONE fixed-size row per user forever (the
  * engine-managed ValueState lives in RocksDB, so the working set pages
  * to disk instead of bounding on executor heap); per batch each active
  * user folds its rows locally and writes one state row + emits one
  * output row — no per-event state growth, no shuffle wider than the
  * (user) grouping the operator already requires.
  *
  * Determinism: callers replay the source one event-time DAY per
  * micro-batch with day-truncated timestamps (the q285 staging
  * discipline), so a batch's per-user fold is order-free (sums) and the
  * emitted (user, day) rows replicate exactly in SQL as running sums
  * over the per-day rollup. */
object RunningBalance {
  case class In(user_id: Long, ts: java.sql.Timestamp, cents: Long)
  case class Out(user_id: Long, day_us: Long, cum_n: Long, cum_cents: Long)
  case class Bal(n: Long, cents: Long)

  class Proc extends StatefulProcessor[Long, In, Out] {
    @transient private var state: ValueState[Bal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Bal]("bal", Encoders.product[Bal],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      var n = 0L; var c = 0L; var day = Long.MinValue
      rows.foreach { r =>
        n += 1L; c += r.cents
        val us = r.ts.getTime * 1000L // day-truncated: no sub-ms component
        if (us > day) day = us
      }
      val prev = if (state.exists()) state.get() else Bal(0L, 0L)
      val b = Bal(prev.n + n, prev.cents + c)
      state.update(b)
      Iterator.single(Out(key, day, b.n, b.cents))
    }
  }
}
