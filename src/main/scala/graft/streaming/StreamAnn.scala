package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.llmops.Similarity

/** Streaming ANN scoring at ingest — the second stream–STATIC member of
  * the streaming surface (q112 probes a gram index; this probes an
  * EMBEDDING index): vectors arrive in micro-batches, hash to their
  * hyperplane-LSH bucket with the native signature expression (stateless,
  * stream-safe — no window, no explode), and equi-join the static corpus
  * index on the signature; collisions rescore with the exact ×1e8 integer
  * cosine and each arriving vector keeps its best match. Real-time
  * retrieval / dedup-at-ingest for embedding columns.
  *
  * Determinism: the per-query best is a `max(struct(cosine, -cid))`
  * aggregation over 12-dp-rounded cosines of exact integer dots — the
  * same (cosine DESC, cid) rule as q29's ranks, expressed as an
  * aggregation because streaming plans cannot rank with windows.
  *
  * Scale: the index is (id, sig, norm, vec) — one signature expression at
  * build time, broadcast-joined per batch (an eval-set-sized reference,
  * q112's asymmetry); per-batch work is signature + equi-join + rescore of
  * collisions only. State is the per-query best under complete mode (the
  * oracle-check contract; production uses update mode + a sink upsert).
  */
object StreamAnn {

  /** Per arriving vector: bucket-collision count and best static match.
    * `stream`: streaming (id, vec); `index`: static (id, vec) — indexed
    * once here (signature + norm) and reused every micro-batch.
    * Returns (id, n_candidates, best_match, best_cosine). */
  def bestMatch(stream: DataFrame, index: DataFrame, planes: Int,
      dim: Int): DataFrame = {
    val idx = index.select(col("id").as("cid"), col("vec").as("cv"),
      GraftFunctions.hyperplaneSig(col("vec"), planes, dim,
        Similarity.SigScale).as("sig"),
      sqrt(GraftFunctions.arrayDotScaled(col("vec"), col("vec"),
        Similarity.ExactScale).cast("double")).as("cn"))
    val probes = stream.select(col("id").as("qid"), col("vec").as("qv"),
      GraftFunctions.hyperplaneSig(col("vec"), planes, dim,
        Similarity.SigScale).as("sig"),
      sqrt(GraftFunctions.arrayDotScaled(col("vec"), col("vec"),
        Similarity.ExactScale).cast("double")).as("qn"))
    probes.join(broadcast(idx), "sig")
      .withColumn("cosine", round(
        GraftFunctions.arrayDotScaled(col("qv"), col("cv"), Similarity.ExactScale)
          .cast("double") / (col("qn") * col("cn")), 12))
      .groupBy(col("qid").as("id"))
      .agg(count(lit(1)).as("n_candidates"),
        max(struct(col("cosine"), (-col("cid")).as("neg_cid"))).as("best"))
      .select(col("id"), col("n_candidates"),
        (-col("best.neg_cid")).as("best_match"),
        col("best.cosine").as("best_cosine"))
  }
}
