package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.{FreshReader, FreshReaderConfig}
import graft.model.{DataRequest, EntityView}
import graft.registry.FreshnessManager

/** Pluggable entity-view state between micro-batches: in production a
  * transactional table (or partition-scoped parquet rewrite, SURVEY §2.2
  * S2); in tests an in-memory frame. */
trait ViewStore {
  def get(): DataFrame
  def put(view: DataFrame): Unit
}

/** Structured-Streaming freshen (SURVEY §2.2 S26) — the online analogue of
  * the reference's per-read freshening, re-expressed micro-batch:
  *
  *   events stream → (per batch) fold new (entity, ts, value) rows into the
  *   entity view → run the SAME batch FreshReader over the updated view →
  *   upsert the store.
  *
  * The batch engine is reused verbatim — streaming is a driver loop around
  * it, which is exactly the Spark idiom (`foreachBatch`). The freshness
  * clock advances with event time: asOf = max event ts seen so far, so runs
  * are deterministic under replay (no wall clock, SURVEY §7 hard parts).
  *
  * Scale: each micro-batch merge groups only the batch's entities
  * (`cellsFromTall` on the delta) and joins them into the stored view —
  * work proportional to the delta, not the corpus, given an upsert-capable
  * store.
  */
final class StreamingFreshen(
    manager: FreshnessManager,
    tableName: String,
    store: ViewStore,
    cellName: String,
    request: DataRequest) {

  /** Merge a tall (entity_id, ts, value) delta into the view: union the
    * version arrays per entity, keep newest-first order. `array_distinct`
    * makes the merge IDEMPOTENT — cells are sets of (ts, value) versions,
    * so an at-least-once replay of a micro-batch (foreachBatch's delivery
    * contract) re-merging the same delta is a no-op rather than a
    * duplicate-version corruption. */
  private[streaming] def mergeDelta(view: DataFrame, delta: DataFrame): DataFrame = {
    val deltaView = EntityView.cellsFromTall(delta, EntityView.EntityId, "ts", "value", cellName)
    view.as("v").join(deltaView.as("d"), Seq(EntityView.EntityId), "full_outer")
      .select(col(EntityView.EntityId),
        sort_array(array_distinct(concat(
          coalesce(col(s"v.$cellName"), array()),
          coalesce(col(s"d.$cellName"), array()))), asc = false).as(cellName))
  }

  private var maxTs: Long = Long.MinValue

  /** Process one micro-batch of tall (entity_id, ts, value) rows — public so
    * batch replays / backfills can drive the same path deterministically. */
  def processBatch(batch: DataFrame): Unit = {
    val rows = batch.select(col(EntityView.EntityId), col("ts").cast("long"), col("value"))
    val batchMax = rows.agg(max("ts")).head()
    // empty batches (idle stream) advance nothing and must not pay a
    // corpus-sized merge+freshen+rewrite
    if (batchMax.isNullAt(0)) return
    maxTs = math.max(maxTs, batchMax.getLong(0))
    val merged = mergeDelta(store.get(), rows)
    val reader = new FreshReader(manager, tableName, merged, FreshReaderConfig(asOf = maxTs))
    store.put(reader.freshenAll(request))
  }

  /** Attach to a streaming frame of (entity_id, ts, value). */
  def start(events: DataFrame, checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => processBatch(batch) }
      .start()
}

object StreamingFreshen {
  import org.apache.spark.sql.{Dataset, SparkSession}
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  case class EventRow(entity_id: Long, ts: Long, value: Double)
  case class Newest(entity_id: Long, ts: Long, value: Double)

  case class TimedEvent(entity_id: Long, eventTime: java.sql.Timestamp, value: Double)
  case class Refreshed(entity_id: Long, ts: Long, value: Double, refreshed: Boolean)

  /** PUSH-based automatic freshening — the one reference semantic the batch
    * engine cannot express: a cell goes stale by TIME passing, not by being
    * read. `flatMapGroupsWithState` + an EVENT-TIME timer per entity: state
    * holds the newest (ts, value); the timer is armed at
    * `newest_ts + shelfLifeMs`; when the watermark passes it with no newer
    * event, `score` re-scores the entity, the refreshed version writes back
    * into state (the producer write-back, R11) stamped AT the expiry
    * deadline (deterministic under replay — never the wall clock or the
    * watermark value), the timer re-arms, and the refreshed row is emitted
    * downstream. Late events older than the state are absorbed without
    * regressing the view or the timer (same rule as [[newestView]]).
    *
    * State is one (ts, value) per entity: bounded, hash-partitioned by
    * entity, scales with entity count. The input must carry a watermark on
    * `eventTime` (e.g. `.withWatermark("eventTime", "0 seconds")`). */
  def expiryFreshen(events: Dataset[TimedEvent], shelfLifeMs: Long,
      score: (Long, Double) => Double): Dataset[Refreshed] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.entity_id)
      .flatMapGroupsWithState[(Long, Double), Refreshed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (id, batch, state: GroupState[(Long, Double)]) =>
          // a timeout timestamp must sit strictly beyond the watermark;
          // deadlines already passed fire on the next trigger
          def arm(deadlineMs: Long): Unit = state.setTimeoutTimestamp(
            math.max(deadlineMs, state.getCurrentWatermarkMs() + 1))
          if (state.hasTimedOut) {
            val (ts, v) = state.get
            val refreshTs = ts + shelfLifeMs
            val refreshed = (refreshTs, score(ts, v))
            state.update(refreshed)
            arm(refreshTs + shelfLifeMs)
            Iterator(Refreshed(id, refreshTs, refreshed._2, refreshed = true))
          } else {
            val incoming = batch
              .map(e => (e.eventTime.getTime, e.value))
              .foldLeft(state.getOption.getOrElse((Long.MinValue, Double.MinValue))) {
                (a, b) => if (b._1 > a._1 || (b._1 == a._1 && b._2 > a._2)) b else a
              }
            state.update(incoming)
            arm(incoming._1 + shelfLifeMs)
            Iterator(Refreshed(id, incoming._1, incoming._2, refreshed = false))
          }
      }
  }

  /** Live newest-version view via `mapGroupsWithState`: per-entity state
    * holds the max-(ts, value) cell, updated per micro-batch and emitted on
    * every change — the streaming materialization of the reference's
    * `getMostRecentValue` read (`KijiRowData`), robust to out-of-order
    * events. State is one (ts, value) pair per entity: bounded, partitioned
    * by entity hash, scales with entity count not event count. */
  def newestView(events: Dataset[EventRow]): Dataset[Newest] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.entity_id)
      .mapGroupsWithState[(Long, Double), Newest](GroupStateTimeout.NoTimeout) {
        (id, batch, state: GroupState[(Long, Double)]) =>
          // newest-wins with the same tie-break as the batch cells:
          // (ts, value) lexicographic max
          val incoming = batch.map(e => (e.ts, e.value)).foldLeft(
            state.getOption.getOrElse((Long.MinValue, Double.MinValue))) {
            (a, b) => if (b._1 > a._1 || (b._1 == a._1 && b._2 > a._2)) b else a
          }
          state.update(incoming)
          Newest(id, incoming._1, incoming._2)
      }
  }
}
