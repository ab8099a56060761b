package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{arrayDot, arrayDotScaled}

/** Similarity search over an `Array[Float]` embedding column.
  *
  * Execution shape: dot products run through [[graft.functions.ArrayDot]] —
  * a native Catalyst expression whose `doGenCode` emits one tight scalar
  * loop per candidate pair. (Earlier shapes measured here: array
  * higher-order `aggregate` lambdas are interpreted per element, 15-30×
  * slower; posexplode + hash-agg works but moves |pairs|·dim rows through
  * an aggregation. The fused expression scores each pair in place.)
  *
  * Numeric modes:
  *   - `exact = true`: elements quantize to scaled 64-bit integers (×1e8,
  *     half-away-from-zero) and products accumulate in exact integer
  *     arithmetic — order-independent and cross-engine bit-identical, used
  *     by the oracle-checked queries; the DuckDB oracle runs the same
  *     formula. Scaling cancels in the cosine ratio.
  *   - `exact = false` (default): double accumulation in element order —
  *     the fast production path.
  *
  * Cosines are rounded to 12 dp: above any ulp noise, far below any real
  * cosine gap.
  *
  * Scale design: brute force is O(n·m·d) with the bounded query side
  * broadcast — correct baseline and ground truth. The LSH path buckets
  * vectors by deterministic random-hyperplane sign signatures, so candidate
  * generation is an equi-join on the signature and only in-bucket pairs pay
  * the dot-product cost.
  */
object Similarity {

  /** Element scale for exact mode: 8 decimal digits. Products are ≤ 1e16 per
    * element, so a 64-bit sum holds ~900 dimensions of unit-normalized data
    * without overflow. */
  val ExactScale: Long = 100000000L

  private def dot(a: Column, b: Column, exact: Boolean): Column =
    if (exact) arrayDotScaled(a, b, ExactScale) else arrayDot(a, b)

  /** Per-vector Euclidean norms (id, nrm) from an (id, vec) frame — one
    * fused self-dot per row, no explode. In exact mode the norm stays in
    * element-scale units; the scale cancels in the cosine ratio. */
  def norms(vectors: DataFrame, exact: Boolean = false): DataFrame =
    vectors.select(col("id"),
      sqrt(dot(col("vec"), col("vec"), exact).cast("double")).as("nrm"))

  /** Brute-force cosine top-k: for each query vector the k nearest other
    * vectors by cosine, rank-ordered (ties broken by neighbor id).
    * `queries`/`corpus`: (id, vec) frames. The query side is broadcast —
    * size it accordingly. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      exact: Boolean = false): DataFrame = {
    val q = norms(queries, exact)
      .select(col("id").as("qid"), col("nrm").as("qn"))
      .join(queries.select(col("id").as("qid"), col("vec").as("qv")), "qid")
    val c = norms(corpus, exact)
      .select(col("id").as("cid"), col("nrm").as("cn"))
      .join(corpus.select(col("id").as("cid"), col("vec").as("cv")), "cid")
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        dot(col("qv"), col("cv"), exact).as("dot"), col("qn"), col("cn"))
    rank(scored, k)
  }

  /** Rank (qid, cid, dot, qn, cn) rows into per-query top-k by cosine. */
  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored
      .withColumn("cosine", round(col("dot").cast("double") / (col("qn") * col("cn")), 12))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("vec_id"), col("rank"),
        col("cid").as("neighbor_id"), col("cosine"))
  }

  /** Exact cosine near-dup PAIRS: all (id_a < id_b) with cosine ≥
    * `minCosine` (the threshold form of similarity search — the north-star
    * "embedding-cosine near-dup" shape, complementing top-k).
    *
    * `scale` quantizes elements to ×scale integers so the dot is exact
    * 64-bit arithmetic on BOTH engines; 1e4 keeps a 64-dim dot ≤ ~1e10,
    * exactly representable in the oracle's double accumulation too. The
    * unrounded cosine drives the threshold (identical IEEE doubles on both
    * sides); the 12-dp round happens only in the output projection, after
    * the filter, so it is paid per surviving pair, not per candidate.
    *
    * Plan: one side broadcast, the probe side round-robin repartitioned —
    * pair generation is map-side with cluster-wide parallelism (the q38
    * pattern). This is the EXACT baseline; at corpus sizes where the
    * broadcast no longer fits, generate candidates with
    * [[cosineTopKLsh]]-style signature buckets and rescore. */
  def cosinePairs(vectors: DataFrame, minCosine: Double,
      scale: Long = 10000L): DataFrame = {
    val spark = vectors.sparkSession
    val withNorm = vectors.select(col("id"), col("vec"),
      sqrt(arrayDotScaled(col("vec"), col("vec"), scale).cast("double")).as("nrm"))
    val probe = withNorm.repartition(spark.sessionState.conf.numShufflePartitions)
    probe.as("a")
      .join(broadcast(withNorm.as("b")), col("a.id") < col("b.id"))
      .withColumn("cos_raw",
        arrayDotScaled(col("a.vec"), col("b.vec"), scale).cast("double")
          / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos_raw") >= minCosine)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cos_raw"), 12).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane i, dim j):
    * an LCG over i·d+j mapped to ±1 via bit 16 — no RNG state, reproducible
    * anywhere. (The LCG's low bit is pure parity — using it makes every
    * plane identical; a middle bit is well mixed.) */
  private def planeSign(i: Int, j: Int, dim: Int): Int =
    if ((((2654435761L * (i.toLong * dim + j) + 40503L) % 4294967296L) >> 16 & 1L) == 0L) -1 else 1

  /** Random-hyperplane LSH bucket signature: bit i = sign(v · plane_i).
    * A single codegen'd expression tree (planes·dim multiply-adds). */
  def hyperplaneSignature(vec: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { i =>
      val dot = (0 until dim).map { j =>
        element_at(vec, j + 1).cast("double") * lit(planeSign(i, j, dim))
      }.reduce(_ + _)
      when(dot > 0, 1L << i).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** IVF (inverted-file) approximate nearest neighbors: a KMeans coarse
    * quantizer assigns every vector to one of `nlist` cells; each query
    * probes its `nprobe` nearest cells and pays the fused-dot cost only for
    * vectors in those cells. The standard ANN trade: recall grows with
    * nprobe, cost with nprobe/nlist. Centroids are tiny (nlist·dim) and
    * broadcast; the candidate join is an equi-join on the cell id. */
  /** Fitted coarse quantizers keyed by the caller's index name: an IVF
    * quantizer IS an index — built once when the collection is indexed,
    * reused by every search until a rebuild — so repeated queries against
    * the same collection must not refit KMeans. Driver-held model objects
    * only (nlist·dim doubles), never data. */
  private val quantizers = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.ml.clustering.KMeansModel]

  def cosineTopKIvf(vectors: DataFrame, k: Int, nlist: Int, nprobe: Int,
      seed: Long = 42L, indexKey: Option[String] = None): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = vectors.sparkSession
    val withFv = vectors.withColumn("fv",
      array_to_vector(col("vec").cast("array<double>")))
    // few Lloyd iterations: the quantizer only needs coarse cells, not
    // converged centroids — recall is governed by nprobe, and fit cost is
    // the query's dominant term
    def fit() = new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(withFv)
    val model = indexKey match {
      case Some(key) => quantizers.getOrElseUpdate(s"$key:$nlist:$seed", fit())
      case None => fit()
    }
    val assigned = model.transform(withFv)
      .select(col("id"), col("vec"), col("cell"),
        sqrt(arrayDot(col("vec"), col("vec")).cast("double")).as("nrm"))
      .persist()
    // centroid table: (cell, cvec as float array) — nlist rows, broadcast
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.toIndexedSeq
        .map { case (c, i) => (i, c.toArray.map(_.toFloat)) })
      .toDF("ccell", "cvec")
    // each query probes its nprobe nearest cells (by centroid cosine-dot)
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("cdot").desc, col("ccell"))
    val probes = assigned.select(col("id").as("qid"), col("vec").as("qv"))
      .join(broadcast(centroids))
      .withColumn("cdot", arrayDot(col("qv"), col("cvec")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("ccell").as("cell"))
    val scored = probes
      .join(assigned.select(col("id").as("qid"), col("nrm").as("qn"), col("vec").as("qv")), "qid")
      .join(assigned.select(col("id").as("cid"), col("cell"), col("nrm").as("cn"),
        col("vec").as("cv")), "cell")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), arrayDot(col("qv"), col("cv")).as("dot"),
        col("qn"), col("cn"))
    rank(scored, k)
  }

  /** Approximate nearest neighbors: bucket by hyperplane signature, fused
    * exact cosine within buckets only, top-k per query. Candidate
    * generation is an equi-join on the signature. */
  def cosineTopKLsh(vectors: DataFrame, k: Int, planes: Int, dim: Int,
      exact: Boolean = false): DataFrame = {
    // persisted: both self-join sides would otherwise recompute the
    // signature pipeline
    val sig = vectors
      .select(col("id"), col("vec"),
        hyperplaneSignature(col("vec"), planes, dim).as("sig"),
        sqrt(dot(col("vec"), col("vec"), exact).cast("double")).as("nrm"))
      .persist()
    val scored = sig.as("a")
      .join(sig.as("b"), col("a.sig") === col("b.sig") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("qid"), col("b.id").as("cid"),
        dot(col("a.vec"), col("b.vec"), exact).as("dot"),
        col("a.nrm").as("qn"), col("b.nrm").as("cn"))
    rank(scored, k)
  }
}
