package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an `Array[Float]` embedding column.
  *
  * Execution shape: dot products run as EXPLODED codegen hash aggregations —
  * `posexplode` the vectors, multiply element pairs, `SUM` per (query,
  * candidate). Spark's array higher-order functions (`aggregate`/`zip_with`
  * lambdas) are interpreted per element and measured 15-30× slower here, so
  * the hot path avoids them entirely.
  *
  * Numeric modes:
  *   - `exact = true`: elements are quantized to scaled 64-bit integers
  *     (×1e8, round-half-away) and dot products accumulate in exact integer
  *     arithmetic — order-independent and cross-engine bit-identical, used by
  *     the oracle-checked queries. (A DECIMAL(38,18) accumulation is equally
  *     exact but measured 12× slower: it falls off the vectorized sum path.)
  *     Scaling cancels in the cosine: dot_s/(‖a‖_s·‖b‖_s).
  *   - `exact = false` (default): plain double accumulation — the fast
  *     production path (hash aggregation is order-independent per group but
  *     double rounding makes results engine-specific at the last ulp).
  *
  * Scale design: brute force is O(n·m·d) with the bounded query side
  * broadcast — correct baseline and ground truth. The LSH path buckets
  * vectors by deterministic random-hyperplane sign signatures, so candidate
  * generation is an equi-join on (signature, pos) and only in-bucket pairs
  * pay the exact-cosine cost.
  */
object Similarity {

  /** Element scale for exact mode: 8 decimal digits. Products are ≤ 1e16 per
    * element, so a 64-bit sum holds ~900 dimensions of unit-normalized data
    * without overflow. */
  val ExactScale: Long = 100000000L

  /** Quantize one element to a scaled long, half-away-from-zero. Spelled as
    * sign·floor(|x|·S + 0.5) — plain double ops in codegen; `round()` would
    * route every value through BigDecimal (measured ~4× slower end-to-end),
    * and this formula is engine-portable verbatim. */
  private def quantize(x: Column): Column = {
    val xd = x.cast("double")
    (signum(xd) * floor(abs(xd) * ExactScale + 0.5d)).cast("long")
  }

  /** Element projection applied once at explode time — the joins and sums
    * downstream then run on plain longs/doubles. */
  private def proj(x: Column, exact: Boolean): Column =
    if (exact) quantize(x) else x.cast("double")

  /** Per-vector Euclidean norms (id, nrm) from an (id, vec) frame. In exact
    * mode the norm stays in element-scale units; the scale cancels in the
    * cosine ratio. */
  def norms(vectors: DataFrame, exact: Boolean = false): DataFrame =
    vectors.select(col("id"), posexplode(col("vec")).as(Seq("pos", "x")))
      .select(col("id"), proj(col("x"), exact).as("x"))
      .groupBy("id")
      .agg(sqrt(sum(col("x") * col("x")).cast("double")).as("nrm"))

  /** Brute-force cosine top-k: for each query vector the k nearest other
    * vectors by cosine, rank-ordered (ties broken by neighbor id).
    * `queries`/`corpus`: (id, vec) frames. The exploded query side is
    * broadcast — size it accordingly (|queries|·dim rows). */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      exact: Boolean = false): DataFrame = {
    val qn = norms(queries, exact).withColumnRenamed("id", "qid").withColumnRenamed("nrm", "qn")
    val cn = norms(corpus, exact).withColumnRenamed("id", "cid").withColumnRenamed("nrm", "cn")
    val qt = queries.select(col("id").as("qid"), posexplode(col("vec")).as(Seq("p", "x")))
      .select(col("qid"), col("p"), proj(col("x"), exact).as("x"))
    val ct = corpus.select(col("id").as("cid"), posexplode(col("vec")).as(Seq("p", "y")))
      .select(col("cid"), col("p"), proj(col("y"), exact).as("y"))
    val dots = ct.join(broadcast(qt), qt("p") === ct("p") && col("qid") =!= col("cid"))
      .groupBy("qid", "cid")
      .agg(sum(col("x") * col("y")).as("dot"))
    rank(dots, qn, cn, k)
  }

  /** Rounded to 12 dp: exact-mode decimal dots are engine-independent, but
    * the final decimal→double cast can differ by 1 ulp across engines; 12 dp
    * is far above ulp noise and far below any real cosine gap. */
  private def rank(dots: DataFrame, qn: DataFrame, cn: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    dots.join(qn, "qid").join(cn, "cid")
      .withColumn("cosine", round(col("dot").cast("double") / (col("qn") * col("cn")), 12))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("vec_id"), col("rank"),
        col("cid").as("neighbor_id"), col("cosine"))
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

  /** Approximate nearest neighbors: bucket by hyperplane signature, exact
    * cosine within buckets only, top-k per query. Candidate generation is an
    * equi-join on (signature, element position). */
  def cosineTopKLsh(vectors: DataFrame, k: Int, planes: Int, dim: Int,
      exact: Boolean = false): DataFrame = {
    val nrm = norms(vectors, exact)
    // persisted: both self-join sides + the signature expression would
    // otherwise recompute the whole explode pipeline
    val tall = vectors
      .select(col("id"), hyperplaneSignature(col("vec"), planes, dim).as("sig"),
        posexplode(col("vec")).as(Seq("p", "x")))
      .select(col("id"), col("sig"), col("p"), proj(col("x"), exact).as("x"))
      .persist()
    val dots = tall.as("a")
      .join(tall.as("b"),
        col("a.sig") === col("b.sig") && col("a.p") === col("b.p") &&
          col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("qid"), col("b.id").as("cid"))
      .agg(sum(col("a.x") * col("b.x")).as("dot"))
    rank(dots,
      nrm.withColumnRenamed("id", "qid").withColumnRenamed("nrm", "qn"),
      nrm.withColumnRenamed("id", "cid").withColumnRenamed("nrm", "cn"), k)
  }
}
