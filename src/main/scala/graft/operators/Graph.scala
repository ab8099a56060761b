package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph ranking over edge lists — the corpus-curation use is domain/source
  * quality weighting (rank a crawl's link graph, weight documents by their
  * domain's rank), the same role PageRank/harmonic centrality play in
  * public crawl pipelines.
  *
  * Scale design:
  *   - An iteration is one equi-join (edges ⋈ ranks on src) plus one
  *     aggregation (by dst) — both shuffle on node id, never materializing
  *     anything wider than (node, rank).
  *   - `localCheckpoint` after every iteration keeps the logical plan
  *     constant-size (same lineage discipline as
  *     [[graft.llmops.Dedup.connectedComponents]]); on a real cluster swap
  *     in reliable `checkpoint`.
  *   - Determinism across engines: ranks are BIGINT in units of 1e-9
  *     ("rank_q"), updated with PURE INTEGER arithmetic —
  *     contrib = rank_q div out_deg, then
  *     rank_q' = (SCALE·(100−d100)) div 100 + (Σcontrib·d100) div 100 —
  *     so there is no floating-point addition order to disagree on. An
  *     unrolled SQL oracle reproduces it bit-for-bit.
  */
object Graph {

  /** Rank quantization: 1.0 ≡ 1e9. Integer sums of n nodes stay well under
    * 2^63 for any realistic node count (n·SCALE·100 < 2^63 up to n ≈ 9e10). */
  val Scale: Long = 1000000000L

  /** Integer-quantized PageRank (unnormalized formulation
    * r' = (1−d) + d·Σ r_i/outdeg_i over in-neighbors i).
    *
    * `edges` is a directed (src, dst) frame; parallel edges are collapsed.
    * `d100` is the damping factor ×100 (85 ⇒ d = 0.85) so every update
    * stays in BIGINT arithmetic. Dangling-node mass is not redistributed
    * (the unnormalized variant used when ranks feed a relative quality
    * ORDER, not a probability). Returns (id, rank_q) for every node
    * appearing as src or dst.
    *
    * Checkpoint cadence: unlike the CC loop (whose labels feed TWO branches
    * per iteration ⇒ exponential plan growth), each rank frame feeds exactly
    * one downstream join, so the plan grows LINEARLY — eager checkpointing
    * every iteration would pay a materialization without preventing any
    * blowup. `checkpointEvery` (default 4) truncates lineage periodically:
    * short runs stay one lazy pipeline (identical outDeg subtrees collapse
    * under exchange reuse); long runs still get bounded plans and
    * driver-side analysis time. */
  def pagerank(edges: DataFrame, iters: Int, d100: Int = 85,
      checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 0 && d100 >= 0 && d100 <= 100 && checkpointEvery >= 1)
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val outDeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
    val base = lit(Scale * (100L - d100) / 100L)
    var ranks = nodes.withColumn("rank_q", lit(Scale))
    for (i <- 0 until iters) {
      val contribs = e.join(ranks.join(outDeg, "id"), e("src") === col("id"))
        .select(col("dst").as("id"),
          expr("rank_q div out_deg").as("contrib"))
        .groupBy("id").agg(sum("contrib").as("in_q"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (base + expr(s"coalesce(in_q, CAST(0 AS BIGINT)) * $d100 div 100")).as("rank_q"))
      if ((i + 1) % checkpointEvery == 0 && i != iters - 1)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
