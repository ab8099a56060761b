package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the "what happened shortly
  * before X" primitive (errors ⟵ preceding clicks, conversions ⟵ preceding
  * impressions). Cf. the reference joining freshened producer output with
  * the just-read row at read time (kiji-scoring
  * FreshKijiTableReader.java:106); this is the continuous two-stream
  * generalization,
  * built on Structured Streaming's watermarked symmetric hash join rather
  * than any per-row RPC.
  *
  * Semantics: inner join on `key`, keeping (probe, ref) pairs with
  * ref_ts ∈ [probe_ts − lookback, probe_ts] — identical to the batch
  * interval join over the same frames, which is what the oracle checks.
  *
  * Scale: Spark's stream-stream join shuffles BOTH streams by the join key
  * into a symmetric state store; the interval condition bounds each side's
  * event-time range relative to the other, so with watermarks on both
  * sides the engine derives state-expiry watermarks and evicts rows older
  * than lookback + delay — state is O(key-rate · lookback), not O(stream
  * history). Without the two-sided time bound the state would grow
  * unboundedly; the bound IS the scale design.
  */
object StreamJoin {

  /** `probe` must carry (`key`, `probeTs` timestamp), `ref` (`key`,
    * `refTs` timestamp), with all other column names disjoint;
    * `probeTs` ≠ `refTs`. Watermarks of `delayMs` are applied to both
    * sides (late rows beyond the delay may be dropped — the streaming
    * contract; AvailableNow replays in file order, so staged sources
    * deliver in-order and lose nothing). */
  def intervalJoin(probe: DataFrame, ref: DataFrame, key: String,
      probeTs: String, refTs: String, lookbackMs: Long,
      delayMs: Long): DataFrame =
    intervalJoinTyped(probe, ref, key, probeTs, refTs, lookbackMs, delayMs,
      "inner")

  /** LEFT-OUTER stream-stream interval join: every probe row emits — with
    * its matches while they exist, and NULL-extended once the engine can
    * PROVE no match can still arrive. That proof is the watermark: the
    * join's global watermark is the MIN of both sides' (max event time −
    * delay), and a probe row whose window upper bound (probeTs, since the
    * condition is refTs ≤ probeTs) falls behind it is evicted from state,
    * emitting the NULL row in that micro-batch. So "unmatched" is not a
    * batch-side anti join — it is a STREAMING VERDICT whose timing is part
    * of the semantics: probe rows newer than the final watermark stay
    * unproven and never emit (the declared contract, same genus as q190/
    * q210's late-drop gates; the oracle replicates the cutoff
    * arithmetic). State bounds are [[intervalJoin]]'s — the NULL emission
    * is exactly the eviction the inner join already performs, surfaced
    * instead of discarded, so the outer form costs nothing extra at
    * 100 TB. */
  def intervalJoinLeftOuter(probe: DataFrame, ref: DataFrame, key: String,
      probeTs: String, refTs: String, lookbackMs: Long,
      delayMs: Long): DataFrame =
    intervalJoinTyped(probe, ref, key, probeTs, refTs, lookbackMs, delayMs,
      "leftOuter")

  private def intervalJoinTyped(probe: DataFrame, ref: DataFrame, key: String,
      probeTs: String, refTs: String, lookbackMs: Long, delayMs: Long,
      joinType: String): DataFrame = {
    require(probeTs != refTs, "probe and ref event-time columns must differ")
    val p = probe.withWatermark(probeTs, s"$delayMs milliseconds")
    val r = ref.withWatermark(refTs, s"$delayMs milliseconds")
    p.join(r.withColumnRenamed(key, s"__r_$key"),
      col(key) === col(s"__r_$key") &&
        col(refTs) >= col(probeTs) - expr(s"INTERVAL $lookbackMs MILLISECONDS") &&
        col(refTs) <= col(probeTs),
      joinType)
      .drop(s"__r_$key")
  }
}
