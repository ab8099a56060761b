package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** MAP STATE on the `transformWithState` API: per-user running event-type
  * counters in an engine-managed `MapState[String, Long]` — the keyed
  * sub-state primitive ([[RunningBalance]] covers ValueState, q304's
  * [[TimerSessions]] covers timers; this covers the map member of the
  * state API). Each micro-batch folds the user's rows locally, bumps one
  * map entry per touched type, and emits the user's CURRENT profile: how
  * many distinct types ever seen, and the top type by cumulative count
  * (ties → lexicographically smallest type, so both engines agree).
  *
  * Scale posture: state is one map entry per (user, type-ever-seen) —
  * bounded by the type vocabulary, never event volume — living in
  * RocksDB; per batch each active user writes only the entries it
  * touched and emits ONE row. */
object TypeCounts {
  case class In(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class Out(user_id: Long, day_us: Long, n_types: Long,
    top_type: String, top_cnt: Long)

  class Proc extends StatefulProcessor[Long, In, Out] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("cnt", Encoders.STRING,
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      val local = scala.collection.mutable.Map.empty[String, Long]
      var day = Long.MinValue
      rows.foreach { r =>
        local(r.event_type) = local.getOrElse(r.event_type, 0L) + 1L
        val us = r.ts.getTime * 1000L
        if (us > day) day = us
      }
      local.foreach { case (t, n) =>
        val prev = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, prev + n)
      }
      var nTypes = 0L
      var topT: String = null
      var topC = 0L
      counts.iterator().foreach { case (t, c) =>
        nTypes += 1L
        if (c > topC || (c == topC && (topT == null || t < topT))) {
          topT = t; topC = c
        }
      }
      Iterator.single(Out(key, day, nTypes, topT, topC))
    }
  }
}
