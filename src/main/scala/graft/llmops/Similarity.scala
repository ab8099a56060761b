package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an `Array[Float]` embedding column.
  *
  * Numeric determinism: the dot products are accumulated in DECIMAL(38,18)
  * (exact, order-independent) and only cast to DOUBLE at the end, so Spark
  * and the DuckDB oracle produce bit-identical cosines — float summation
  * order would otherwise diverge between engines. Elements are routed
  * float→double→decimal (a float→decimal cast loses precision in some
  * engines).
  *
  * Scale design: brute force is O(n·m·d) — correct baseline, used for small
  * query sets and as ground truth. The LSH path buckets vectors by
  * random-hyperplane sign signatures (deterministic planes derived from mod-P
  * hashing, no RNG), so candidate generation is an equi-join on the
  * signature; only in-bucket pairs pay the exact-cosine cost.
  */
object Similarity {

  private def toDec(x: Column): Column =
    x.cast("double").cast("decimal(18,9)")

  /** Exact decimal dot product of two float-array columns. */
  def dotDecimal(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => toDec(x) * toDec(y)),
      lit(0).cast("decimal(38,18)"),
      (acc, x) => (acc + x).cast("decimal(38,18)"))

  /** Euclidean norm (double) computed from the exact decimal self-dot. */
  def normD(a: Column): Column = sqrt(dotDecimal(a, a).cast("double"))

  /** Brute-force cosine top-k: for each query vector, the k nearest other
    * vectors by cosine, rank-ordered (ties broken by neighbor id).
    * `queries`/`corpus`: (id, vec) frames. Broadcast the smaller side when
    * running a bounded query set against a large corpus. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("vec").as("qv"),
      normD(col("vec")).as("qn"))
    val c = corpus.select(col("id").as("cid"), col("vec").as("cv"),
      normD(col("vec")).as("cn"))
    // Rounded to 12 dp: the decimal dot is exact, but decimal→double casts
    // can differ by 1 ulp across engines; 12 dp is far above ulp noise and
    // far below any real cosine gap.
    val scored = q.join(c, col("qid") =!= col("cid"))
      .withColumn("cosine",
        round(dotDecimal(col("qv"), col("cv")).cast("double") / (col("qn") * col("cn")), 12))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("vec_id"), col("rank"),
        col("cid").as("neighbor_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane i, dim j):
    * an LCG over i·d+j mapped to ±1 — no RNG state, reproducible anywhere. */
  private def planeSign(i: Int, j: Int, dim: Int): Int =
    if (((2654435761L * (i.toLong * dim + j) + 40503L) % 4294967296L & 1L) == 0L) -1 else 1

  /** Random-hyperplane LSH bucket signature: bit i = sign(v · plane_i).
    * Vectors in the same bucket are near-duplicates with high probability;
    * exact cosine is then computed in-bucket only. */
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
    * cosine within buckets, top-k per query. Trades recall for turning the
    * all-pairs join into an equi-join on the signature. */
  def cosineTopKLsh(vectors: DataFrame, k: Int, planes: Int, dim: Int): DataFrame = {
    val sig = vectors.select(col("id"), col("vec"),
      hyperplaneSignature(col("vec"), planes, dim).as("sig"),
      normD(col("vec")).as("nrm"))
    val pairs = sig.as("a").join(sig.as("b"),
        col("a.sig") === col("b.sig") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("qid"), col("b.id").as("cid"),
        round(dotDecimal(col("a.vec"), col("b.vec")).cast("double")
          / (col("a.nrm") * col("b.nrm")), 12).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("vec_id"), col("rank"),
        col("cid").as("neighbor_id"), col("cosine"))
  }
}
