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

  /** Textbook PageRank with DANGLING-MASS REDISTRIBUTION, integer-
    * quantized: r'(v) = base + (inflow(v) + D div N) · d100 div 100, where
    * D = Σ rank(u) over dangling u (no out-edges) and N = |nodes| — the
    * mass that [[pagerank]] deliberately drops (its scaladoc declares the
    * unnormalized variant) is here spread uniformly, matching the classic
    * random-surfer model on DIRECTED graphs where sinks exist (e.g. the
    * customer→supplier purchase graph: suppliers emit nothing).
    *
    * Scale: the per-round additions over [[pagerank]] are one anti-join
    * (ranks ∖ out-degree keys) + one 1-row sum, attached back via a
    * broadcast crossJoin — no new shuffle profile; N is computed once.
    * Each round references the rank frame in TWO branches (inflow and the
    * dangling sum), so the frame is localCheckpointed EVERY round (the
    * labelPropagation rule), keeping the executed plan linear in rounds. */
  def pagerankDangling(edges: DataFrame, iters: Int, d100: Int = 85): DataFrame = {
    require(iters >= 0 && d100 >= 0 && d100 <= 100)
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint() // spine of every round + the N scalar
    val outDeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
    val n = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    val base = lit(Scale * (100L - d100) / 100L)
    var ranks = nodes.withColumn("rank_q", lit(Scale))
    for (_ <- 0 until iters) {
      val contribs = e.join(ranks.join(outDeg, "id"), e("src") === col("id"))
        .select(col("dst").as("id"),
          expr("rank_q div out_deg").as("contrib"))
        .groupBy("id").agg(sum("contrib").as("in_q"))
      val dangling = broadcast(
        ranks.join(outDeg.select("id"), Seq("id"), "left_anti")
          .agg(coalesce(sum("rank_q"), lit(0L)).as("dangling_q")))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .crossJoin(dangling).crossJoin(n)
        .select(col("id"),
          (base + expr(s"(coalesce(in_q, CAST(0 AS BIGINT)) " +
            s"+ dangling_q div n_nodes) * $d100 div 100")).as("rank_q"))
        .localCheckpoint()
    }
    ranks
  }

  /** Per-node triangle counts over an undirected edge list — the
    * transitivity diagnostic for similarity graphs (how cliquey are the
    * near-dup clusters an LSH/cosine threshold induces) and the base of
    * the clustering coefficient.
    *
    * Algorithm: degree-ordered orientation ("compact-forward", Latapy
    * 2008; the MapReduce shape is Suri & Vassilvitskii 2011): orient every
    * edge from its (deg, id)-smaller endpoint to the larger, so each
    * node's OUT-degree is O(√m) no matter how skewed the raw degrees are
    * — the hub that would generate deg² wedge candidates in a naive
    * node-iterator generates at most O(m) across the whole graph. One
    * wedge self-join on the anchor + one equi-join closing (v₁,v₂)
    * against the oriented edges; every triangle is found exactly once
    * (its (deg,id)-minimum vertex anchors it). Shuffles key on node id /
    * edge endpoint pairs; nothing wider than (id, id, deg) flows.
    * Returns (id, n_tri) for every node in `nodes` (0 when
    * triangle-free). */
  def triangles(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val (_, counts) = triangleCore(edges)
    nodes.select("id")
      .join(counts, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Local clustering coefficient per node, in ppm: cc(v) =
    * 2·tri(v) / (deg(v)·(deg(v)−1)), NULL when deg < 2 (undefined).
    * Shares [[triangles]]' degree-ordered orientation — the degree frame
    * the orientation already builds is reused, so the addition over a
    * plain triangle count is one broadcast-scale join, no new shuffle
    * profile. */
  def clusteringCoeff(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val (deg, counts) = triangleCore(edges)
    nodes.select("id")
      .join(counts, Seq("id"), "left")
      .join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_ppm", expr(Analytics.floorDivScaledSql(
        "2 * n_tri", "deg * (deg - 1)", 1000000L)))
  }

  /** Shared core of [[triangles]] / [[clusteringCoeff]]: canonicalize,
    * orient by (deg, id), count closed wedges. Returns (per-node degree,
    * per-node triangle count — nodes absent when zero). */
  private def triangleCore(edges: DataFrame): (DataFrame, DataFrame) = {
    val canon = edges
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // feeds degree + two orientation sides
    val deg = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .persist() // three consumers: both wedge sides + the closure probe
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") &&
        (col("e1.dv") < col("e2.dv") ||
          (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("w"), col("e1.v").as("x"), col("e2.v").as("y"))
    // (x, y) respects the (deg, id) order, so a closing edge can only be
    // oriented x→y: one equi-join, no disjunctive probe
    val tri = wedges.join(oriented.select(col("u").as("x"), col("v").as("y")),
      Seq("x", "y"))
    val counts = tri
      .select(explode(array(col("w"), col("x"), col("y"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    (deg, counts)
  }

  /** Synchronous min-label propagation over an undirected (id_a, id_b)
    * edge frame, `iters` rounds: label⁰(v) = v,
    * label^{t+1}(v) = min(label^t(v), min over neighbors label^t(u)) —
    * after t rounds every node carries the minimum id within t hops, so
    * communities flood outward from their smallest member (the
    * bounded-round core of connected components, exposed as its own
    * operator because t-hop community detection is itself the product:
    * co-purchase neighborhoods, near-dup families, domain clusters).
    *
    * Scale: one equi-join + one (node) min-aggregation per round — both
    * map-side combinable, nothing wider than (id, label); deterministic
    * because min is order-free. Lineage grows one join per round (iters
    * is small by contract; the unbounded-convergence variant is
    * [[graft.llmops.Dedup.connectedComponents]] with its checkpoint
    * discipline). Returns (id, label) for every endpoint. */
  /** Personalized (topic-sensitive) PageRank: identical integer recurrence
    * to [[pagerank]], but the restart mass (1−d)·Scale lands ONLY on the
    * seed set and rank⁰ is Scale on seeds, 0 elsewhere — so rank measures
    * proximity to the seeds rather than global centrality (Haveliwala
    * 2002). Non-seed ranks are pure damped in-flow; the per-iteration
    * shape (one equi-join + one aggregation on node id) is unchanged, and
    * the seed flag joins broadcast-scale. */
  def pagerankPersonalized(edges: DataFrame, seeds: DataFrame, iters: Int,
      d100: Int = 85, checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 0 && d100 >= 0 && d100 <= 100 && checkpointEvery >= 1)
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val seedFlag = nodes.join(seeds.select("id").distinct(), Seq("id"), "left_semi")
      .withColumn("is_seed", lit(1L))
    val outDeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
    val base = Scale * (100L - d100) / 100L
    var ranks = nodes.join(seedFlag, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("is_seed"), lit(0L)) * Scale).as("rank_q"))
    for (i <- 0 until iters) {
      val contribs = e.join(ranks.join(outDeg, "id"), e("src") === col("id"))
        .select(col("dst").as("id"),
          expr("rank_q div out_deg").as("contrib"))
        .groupBy("id").agg(sum("contrib").as("in_q"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .join(seedFlag, Seq("id"), "left")
        .select(col("id"),
          (coalesce(col("is_seed"), lit(0L)) * base +
            expr(s"coalesce(in_q, CAST(0 AS BIGINT)) * $d100 div 100")).as("rank_q"))
      if ((i + 1) % checkpointEvery == 0 && i != iters - 1)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Bounded-round multi-source BFS over an undirected (id_a, id_b) edge
    * frame: dist⁰ = 0 on the seed set, dist^{t+1}(v) = min(dist^t(v),
    * 1 + min over neighbors dist^t(u)) — after R rounds every node holds
    * its exact hop distance to the nearest seed IF that distance ≤ R
    * (NULL otherwise: "not within R hops" is the declared semantics, the
    * same bounded-round contract as [[labelPropagation]]). Each round is
    * one equi-join + one min-aggregation keyed on node id; the reached
    * frontier frame carries (id, dist) only. Unreached nodes never
    * materialize state — at 100 TB the frame grows with the reachable
    * set, not the graph. */
  def bfsDistance(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1; got $rounds")
    val sym = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint() // consumed once per round
    val nodes = sym.select(col("src").as("id")).distinct()
    val init = nodes.join(seeds.select("id"), Seq("id"), "left_semi")
      .withColumn("dist", lit(0L))
    // dist feeds TWO branches per round (frontier expansion + the union
    // carry) — truncate every round or the plan doubles per round (the
    // labelPropagation rule)
    val reached = (1 to rounds).foldLeft(init) { (dist, _) =>
      val nbr = sym
        .join(dist.select(col("id").as("src"), col("dist")), "src")
        .select(col("dst").as("id"), (col("dist") + 1L).as("dist"))
      dist.unionByName(nbr).groupBy("id").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    nodes.join(reached, Seq("id"), "left")
  }

  /** Bounded-round multi-seed WEIGHTED shortest path (Bellman–Ford
    * min-plus rounds) over an undirected (id_a, id_b, w) edge frame with
    * non-negative integer weights: cost⁰ = 0 on the seed set,
    * cost^{t+1}(v) = min(cost^t(v), min over neighbors u of
    * cost^t(u) + w(u,v)). After R rounds every node holds the exact
    * cheapest cost among paths of ≤ R edges — NULL = "not reachable
    * within R edges" (the [[bfsDistance]] declared-semantics contract;
    * R ≥ |V|−1 makes it exact SSSP). Parallel edges collapse to their
    * minimum weight before the rounds. Each round is one equi-join +
    * one min-aggregation keyed on node id; only the reached frontier
    * carries (id, cost), and the frame is lineage-truncated every round
    * (it feeds two branches — the [[labelPropagation]] rule). */
  def ssspWeighted(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1; got $rounds")
    val sym = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"), col("w"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst"), col("w")))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(min("w").as("w"))
      .localCheckpoint() // consumed once per round
    val nodes = sym.select(col("src").as("id")).distinct()
    val init = nodes.join(seeds.select("id"), Seq("id"), "left_semi")
      .withColumn("cost", lit(0L))
    val reached = (1 to rounds).foldLeft(init) { (cost, _) =>
      val nbr = sym
        .join(cost.select(col("id").as("src"), col("cost")), "src")
        .select(col("dst").as("id"), (col("cost") + col("w")).as("cost"))
      cost.unionByName(nbr).groupBy("id").agg(min("cost").as("cost"))
        .localCheckpoint()
    }
    nodes.join(reached, Seq("id"), "left")
  }

  /** Bounded-round GREEDY MAXIMAL MATCHING over an undirected
    * (id_a, id_b) edge frame (id_a < id_b): each round every node
    * proposes its lexicographically-smallest incident edge, an edge is
    * MATCHED iff both endpoints proposed it (the symmetric handshake —
    * deterministic, no RNG, no tie-breaking ambiguity), and matched
    * nodes' remaining edges are removed before the next round. After R
    * rounds the matched set is a subset of the greedy maximal matching
    * that equals it once a round matches nothing (the bounded-round
    * declared-semantics contract). The graph-coarsening primitive
    * (multilevel partitioners pair nodes exactly this way). Per round:
    * one min-aggregation on node id, two equi-joins for the handshake,
    * two anti-joins for removal; the live edge frame feeds all of them
    * and is lineage-truncated every round. Returns (id_a, id_b, round). */
  def maximalMatching(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1; got $rounds")
    var live = edges.select("id_a", "id_b").distinct()
      .filter(col("id_a") =!= col("id_b")).localCheckpoint()
    var matched = live.limit(0).withColumn("round", lit(0L))
    for (r <- 1 to rounds) {
      val prop = live.select(col("id_a").as("node"), col("id_a"), col("id_b"))
        .unionByName(live.select(col("id_b").as("node"), col("id_a"), col("id_b")))
        .groupBy("node")
        .agg(min(struct(col("id_a"), col("id_b"))).as("e"))
        .select(col("node"), col("e.id_a").as("pa"), col("e.id_b").as("pb"))
      val m = live
        .join(prop.select(col("node").as("id_a"), col("pa"), col("pb")),
          Seq("id_a"))
        .filter(col("pa") === col("id_a") && col("pb") === col("id_b"))
        .select("id_a", "id_b")
        .join(prop.select(col("node").as("id_b"),
          col("pa").as("qa"), col("pb").as("qb")), Seq("id_b"))
        .filter(col("qa") === col("id_a") && col("qb") === col("id_b"))
        .select(col("id_a"), col("id_b"))
        .localCheckpoint() // matched set feeds removal (2 anti-joins) + output
      matched = matched.unionByName(m.withColumn("round", lit(r.toLong)))
      val mn = m.select(col("id_a").as("node"))
        .unionByName(m.select(col("id_b").as("node"))).distinct()
      live = live
        .join(mn.withColumnRenamed("node", "id_a"), Seq("id_a"), "left_anti")
        .join(mn.withColumnRenamed("node", "id_b"), Seq("id_b"), "left_anti")
        .select("id_a", "id_b")
        .localCheckpoint()
    }
    matched
  }

  /** Bounded-round MAXIMAL INDEPENDENT SET over an undirected
    * (id_a, id_b) edge frame — Luby's algorithm DERANDOMIZED: the random
    * priority is the portable 48-bit md5-prefix hash of the node id
    * (DuckDB-replicable, cf. [[Sketches.kmvDistinct]]), a node joins the
    * set when its priority is STRICTLY below every live neighbor's (hash
    * ties — astronomically rare — simply defer both nodes, identically in
    * both engines), and joined nodes plus their neighborhoods leave the
    * graph. After R rounds, nodes that lost all their edges without being
    * dominated are independent by construction and join in the ISOLATED
    * sweep (round R+1); nodes still carrying live edges stay undecided
    * (the bounded-round declared-semantics contract, q221's posture).
    * Per round: one min-aggregation on node id + anti-join removals; the
    * live frame is lineage-truncated every round. The distributed
    * symmetry-breaking primitive behind coloring/scheduling.
    * Returns (id, round). */
  def maximalIndependentSet(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1; got $rounds")
    def prio(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")
    var live = edges.select("id_a", "id_b").distinct()
      .filter(col("id_a") =!= col("id_b")).localCheckpoint()
    val nodes0 = live.select(col("id_a").as("id"))
      .unionByName(live.select(col("id_b").as("id"))).distinct()
      .localCheckpoint()
    var mis = nodes0.limit(0).withColumn("round", lit(0L))
    var killed = nodes0.limit(0).select(col("id").as("node"))
    for (r <- 1 to rounds) {
      val dir2 = live.select(col("id_a").as("node"), col("id_b").as("nbr"))
        .unionByName(live.select(col("id_b").as("node"), col("id_a").as("nbr")))
      val winners = dir2
        .groupBy("node").agg(min(prio(col("nbr"))).as("min_nbr"))
        .filter(prio(col("node")) < col("min_nbr"))
        .select(col("node"))
        .localCheckpoint() // feeds output, neighborhood kill, and removal
      mis = mis.unionByName(winners.select(col("node").as("id"))
        .withColumn("round", lit(r.toLong)))
      val dominated = dir2
        .join(winners, Seq("node")).select(col("nbr").as("node")).distinct()
      val killedNow = winners.unionByName(dominated).distinct()
        .localCheckpoint()
      killed = killed.unionByName(killedNow)
      live = live
        .join(killedNow.withColumnRenamed("node", "id_a"), Seq("id_a"), "left_anti")
        .join(killedNow.withColumnRenamed("node", "id_b"), Seq("id_b"), "left_anti")
        .select("id_a", "id_b")
        .localCheckpoint()
    }
    // isolated sweep: never killed, no live edges left => independent
    val undecided = live.select(col("id_a").as("id"))
      .unionByName(live.select(col("id_b").as("id"))).distinct()
    val isolated = nodes0
      .join(killed.withColumnRenamed("node", "id"), Seq("id"), "left_anti")
      .join(undecided, Seq("id"), "left_anti")
      .withColumn("round", lit(rounds.toLong + 1L))
    mis.unionByName(isolated)
  }

  /** HITS hubs & authorities over a DIRECTED (src, dst) edge frame:
    * integer-quantized power iteration — each round computes raw
    * authority a(v) = Σ h(u) over in-edges, renormalizes to
    * a_q = a·10⁶ div max(a) (1-row broadcast — the integer stand-in for
    * the L2 normalization, keeping every value in [0, 10⁶] so rounds
    * never overflow and both engines agree bit-for-bit), then the same
    * for hubs from the fresh authorities. Per round: two equi-joins +
    * two combinable sums + two 1-row max aggregates; the raw frames feed
    * two consumers each (their max and the join-back), so each is
    * lineage-truncated. Round count is declared semantics (the
    * [[labelPropagation]] contract). Returns (id, hub_q, auth_q). */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1; got $iters")
    val e = edges.select("src", "dst").distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val init = nodes.withColumn("h", lit(1000000L))
    val (hubF, authF) = (1 to iters).foldLeft(
      (init, nodes.withColumn("a", lit(0L)))) { case ((hub, _), _) =>
      val araw = e.join(hub.select(col("id").as("src"), col("h")), "src")
        .groupBy(col("dst").as("id")).agg(sum("h").as("ar"))
        .localCheckpoint() // feeds its max AND the join-back
      val auth = nodes.join(araw, Seq("id"), "left")
        .crossJoin(org.apache.spark.sql.functions.broadcast(
          araw.agg(max("ar").as("am"))))
        .select(col("id"),
          expr("coalesce(ar, 0L) * 1000000L div am").as("a"))
      val hraw = e.join(auth.select(col("id").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("id")).agg(sum("a").as("hr"))
        .localCheckpoint()
      val hub2 = nodes.join(hraw, Seq("id"), "left")
        .crossJoin(org.apache.spark.sql.functions.broadcast(
          hraw.agg(max("hr").as("hm"))))
        .select(col("id"),
          expr("coalesce(hr, 0L) * 1000000L div hm").as("h"))
        .localCheckpoint() // feeds next round's araw AND the readout
      (hub2, auth.localCheckpoint())
    }
    nodes.join(hubF, "id").join(authF, "id")
      .select(col("id"), col("h").as("hub_q"), col("a").as("auth_q"))
  }

  /** Bounded-round K-TRUSS peeling over an undirected (id_a, id_b) edge
    * frame (each edge once, id_a < id_b): each round enumerates triangles
    * (the a-pivot wedge join probed against the edge set — every triangle
    * found exactly once), rolls them to per-edge support, and drops edges
    * with support < k−2; after R rounds the surviving set is a SUPERSET
    * of the true k-truss that equals it once a round removes nothing
    * (the q221/q232 declared bounded-round contract). The truss is the
    * clique-core refinement of k-core — on a near-dup ε-graph it keeps
    * edges embedded in mutually-confirming clusters and peels spurious
    * pairwise links. Per round: one self-equi-join on the pivot + one
    * (b, c) edge probe + one combinable count; the edge frame feeds four
    * consumers per round, so it is lineage-truncated every round. Returns
    * the surviving edges with their last-round support. */
  def ktruss(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"need k >= 3; got $k")
    require(rounds >= 1, s"need rounds >= 1; got $rounds")
    val init = edges.select("id_a", "id_b").distinct()
      .withColumn("support", lit(0L))
      .localCheckpoint()
    (1 to rounds).foldLeft(init) { (e, _) =>
      val ab = e.select(col("id_a").as("a"), col("id_b").as("b"))
      val tri = ab
        .join(e.select(col("id_a").as("a"), col("id_b").as("c")), "a")
        .filter(col("b") < col("c"))
        .join(e.select(col("id_a").as("b"), col("id_b").as("c")),
          Seq("b", "c"), "left_semi")
      val sup = tri.select(col("a"), col("b"))
        .unionByName(tri.select(col("a"), col("c").as("b")))
        .unionByName(tri.select(col("b").as("a"), col("c").as("b")))
        .groupBy(col("a").as("id_a"), col("b").as("id_b"))
        .agg(count(lit(1)).as("support"))
      e.select("id_a", "id_b").join(sup, Seq("id_a", "id_b"))
        .filter(col("support") >= (k - 2).toLong)
        .localCheckpoint()
    }
  }

  /** Integer-exact Newman-modularity pieces of a partition: given an
    * undirected (id_a, id_b) edge frame (each edge once, m edges) and a
    * (id, label) assignment, returns per community its node count,
    * internal edge count L_c, total degree D_c, and the scaled
    * contribution numerator 4·m·L_c − D_c² — Newman's
    * Q = Σ_c (L_c/m − (D_c/2m)²) times the constant 4m², so partition
    * quality compares exactly (BIGINT) across engines and rounds.
    * One equi-join / aggregation per stage; the 1-row m frame attaches
    * as a broadcast. Callers with expensive inputs should checkpoint
    * `edges` (three consumers here) and `labels` (two). */
  def modularityParts(edges: DataFrame, labels: DataFrame): DataFrame = {
    val m = edges.agg(count(lit(1)).as("m"))
    val deg = edges.select(col("id_a").as("id"))
      .unionByName(edges.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val lin = edges
      .join(labels.select(col("id").as("id_a"), col("label").as("la")), "id_a")
      .join(labels.select(col("id").as("id_b"), col("label").as("lb")), "id_b")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("l_in"))
    val dc = labels.join(deg, "id")
      .groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum("d").as("d_tot"))
    dc.join(lin, Seq("label"), "left")
      .crossJoin(org.apache.spark.sql.functions.broadcast(m))
      .select(col("label").as("community"), col("n_nodes"),
        coalesce(col("l_in"), lit(0L)).as("l_in"), col("d_tot"),
        (lit(4L) * col("m") * coalesce(col("l_in"), lit(0L)) -
          col("d_tot") * col("d_tot")).as("contrib_num"))
  }

  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1; got $iters")
    // Checkpoint discipline (same genus as the CC loop): every round
    // references the label frame TWICE (the neighbor-min join AND the
    // carry-forward), so an unchecked chain embeds the upstream edge
    // build 2^iters times in the final plan — for q269 that upstream is
    // the O(n²) cosine ε-join, and the un-truncated form executed it
    // dozens of times (bench forensics, round 10). `sym` is consumed
    // once per round; the label frame is truncated EVERY round.
    val sym = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    val init = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    (1 to iters).foldLeft(init) { (lab, _) =>
      val nbrMin = sym
        .join(lab.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id")).agg(min("label").as("nl"))
      lab.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint()
    }
  }

  /** Bounded-round k-core peeling over an undirected edge list: `rounds`
    * iterations of "drop every node whose degree among survivors is < k",
    * returning the surviving (id, deg) frame with degrees recomputed
    * within the final survivor set. The density filter for similarity /
    * co-occurrence graphs — nodes that keep ≥ k strong neighbors even
    * after their weak neighbors are peeled away.
    *
    * Like [[labelPropagation]], the round count is DECLARED semantics,
    * not a convergence loop: the result is "survives R peeling rounds",
    * which equals the true k-core exactly when a round reaches a fixed
    * point (callers wanting certainty compare rounds R and R+1). That
    * keeps the oracle expressible as R unrolled SQL stages and the plan
    * lineage bounded — unbounded convergence belongs to the CC operator's
    * checkpoint discipline.
    *
    * Scale: a round is two (node) equi-joins + one map-side-combinable
    * count — nothing wider than (src, dst) shuffles; `localCheckpoint`
    * every 4 rounds truncates lineage (swap for reliable `checkpoint` on
    * a cluster). */
  def kcore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k, rounds >= 1; got $k, $rounds")
    val sym = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint() // consumed once per round + the final degree pass
    def degreesWithin(alive: DataFrame): DataFrame = sym
      .join(alive.select(col("id").as("src")), "src")
      .join(alive.select(col("id").as("dst")), "dst")
      .groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val init = sym.select(col("src").as("id")).distinct()
    val survivors = (1 to rounds).foldLeft(init) { (alive, r) =>
      val next = degreesWithin(alive).filter(col("deg") >= k).select("id")
      if (r % 4 == 0 && r != rounds) next.localCheckpoint() else next
    }
    // the final survivor set feeds degreesWithin TWICE (src + dst side):
    // un-truncated, the whole peel chain re-executes once per reference —
    // and once more per CALLER reference (r13 opt forensics: q283 consumed
    // the core three times and paid three full 4-round peels, 12.5 → 5.7 s
    // min same-window after truncation)
    degreesWithin(survivors.localCheckpoint())
  }
}
