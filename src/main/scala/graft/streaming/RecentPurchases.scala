package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** LIST STATE on the `transformWithState` API: a per-user LAST-K window of
  * purchase events carried in an engine-managed `ListState[Item]` — the
  * ordered-collection member of the state API ([[RunningBalance]] covers
  * ValueState, [[TypeCounts]] MapState, [[TimerSessions]] timers). Each
  * micro-batch appends the user's purchases in (day, event_id) order and
  * trims to the newest K, so the state is a bounded recency window no
  * matter how many events flow — the "last 3 transactions" feature every
  * fraud / personalization pipeline materializes.
  *
  * Determinism under the event-time-ordered replay: batches arrive in
  * time order and rows are sorted by (ts, event_id) INSIDE the fold, so
  * (day, event_id) is the total arrival order both engines replay at ANY
  * batch granularity — daily and weekly staging give the same order, and
  * "newest" always means the latest day (tie-broken by event_id), never
  * a batch-local event_id inversion across days. */
object RecentPurchases {
  case class In(user_id: Long, ts: java.sql.Timestamp, cents: Long,
    event_type: String, event_id: Long)
  case class Item(event_id: Long, cents: Long)
  case class Out(user_id: Long, day_us: Long, n_in_window: Long,
    window_cents: Long, newest_cents: Long)

  /** Window size: the newest K purchases per user. */
  val K = 3

  class Proc extends StatefulProcessor[Long, In, Out] {
    @transient private var recent: ListState[Item] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[Item]("recent", Encoders.product[Item],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      val buys = rows.filter(_.event_type == "purchase").toArray
        .sortBy(b => (b.ts.getTime, b.event_id))
      if (buys.isEmpty) Iterator.empty
      else {
        val day = buys.map(_.ts.getTime * 1000L).max
        val cur = (if (recent.exists()) recent.get().toArray
          else Array.empty[Item]) ++
          buys.map(b => Item(b.event_id, b.cents))
        val trimmed = cur.takeRight(K)
        recent.put(trimmed)
        Iterator.single(Out(key, day, trimmed.length.toLong,
          trimmed.map(_.cents).sum, trimmed.last.cents))
      }
    }
  }
}
