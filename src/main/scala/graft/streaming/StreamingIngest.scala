package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.TxStore

/** Exactly-once streaming ingest into a [[TxStore]] — the continuous
  * version of the reference's score-and-write-back loop
  * (kiji-scoring KijiFreshProducerContext.java:91-131 writes per-entity
  * puts; here each micro-batch commits one transactional upsert).
  *
  * Exactly-once = at-least-once delivery (Structured Streaming's
  * checkpoint/replay contract for foreachBatch) × an idempotent sink. The
  * sink is made idempotent with the standard idempotent-writer ledger
  * (Delta's txnAppId/txnVersion pattern): every tagged merge records the
  * cumulative max micro-batch id in the committed manifest, and a replayed
  * batch (id ≤ ledger) is skipped BEFORE any file is staged. Batch ids are
  * monotone within one streaming query, which is exactly the scope a
  * checkpoint replays.
  *
  * Scale: the per-batch work is a TxStore merge — one shuffle of the batch
  * by bucket, new files for touched buckets only — so ingest cost tracks
  * batch size, not table size; the ledger check is one manifest read
  * (driver-side metadata).
  */
object StreamingIngest {

  /** The idempotent foreachBatch sink: shape the raw micro-batch with
    * `transform` (a BATCH aggregation — per-batch deltas, not the
    * streaming engine's cumulative state) and merge it into the store
    * keyed by `key`, unless a merge tagged with this or a later batch id
    * already committed (replay after restart — skip, the data is in). */
  def exactlyOnceSink(path: String, key: String,
      transform: DataFrame => DataFrame = identity)(
      batch: DataFrame, batchId: Long): Unit =
    if (!TxStore.lastTxn(path).exists(_ >= batchId))
      TxStore.merge(batch.sparkSession, path, transform(batch), key,
        txn = Some(batchId))

  /** Run the raw `stream` into the store at `path` until no more data is
    * available (AvailableNow), upserting `transform(batch)` per
    * micro-batch. Aggregating INSIDE the sink keeps the semantics
    * replace-with-this-batch's-aggregate (and needs no state store); a
    * streaming-level aggregation would instead carry cumulative state
    * across batches. The store must be init'd with the transformed
    * schema. */
  def ingestAvailableNow(stream: DataFrame, path: String, key: String,
      checkpoint: String,
      transform: DataFrame => DataFrame = identity): StreamingQuery = {
    val q = stream.writeStream
      .foreachBatch(exactlyOnceSink(path, key, transform) _)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()
    q.awaitTermination()
    q
  }
}
