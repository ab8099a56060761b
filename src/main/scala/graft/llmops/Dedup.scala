package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps._

/** Deduplication operators for large-scale text corpora: exact (content
  * hash), n-gram Jaccard (exact pairwise over a shingle inverted index),
  * MinHash+LSH banding (the 100 TB path), and SimHash.
  *
  * Scale design (the point, per the north star):
  *   - Exact dedup shuffles a 64-hex digest, never the document body.
  *   - Jaccard pairs build an inverted index on shingles; `maxShingleDocFreq`
  *     drops stop-shingles before the self-join — without it a shingle
  *     appearing in d docs contributes d² candidate rows (the classic
  *     quadratic blowup); with it the join is bounded by cap² per shingle.
  *   - MinHash compresses each doc to k integers; LSH banding makes the
  *     candidate join equi-join-able on (band, key) — no pairwise work
  *     outside a bucket. All hashing is expression-level (codegen), mod-P
  *     arithmetic, no UDFs.
  */
object Dedup {

  /** Exact duplicate groups keyed by SHA-256 of the text. Returns one row per
    * distinct content: (text_sha, keep_id = min id, n_copies). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol).cast("binary"), 256).as("text_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Tall distinct (id, shingle) inverted-index frame.
    *
    * Built with posexplode + window `lead` rather than an array
    * higher-order `transform`+`slice` expression: HOF lambdas are
    * interpreted per element and measured ~10× slower; the window form
    * stays in whole-stage codegen and its shuffle (by doc id) is the same
    * partitioning the downstream per-doc aggregations want. */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val tall = docs.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    if (n == 1) tall.select(col("id"), col("tok").as("s")).distinct()
    else {
      val w = Window.partitionBy("id").orderBy("pos")
      val parts = col("tok") +: (1 until n).map(i => lead(col("tok"), i).over(w).as(s"t$i"))
      tall.select((col("id") +: col("pos") +: parts): _*)
        .filter(col(s"t${n - 1}").isNotNull)
        .select(col("id"),
          concat_ws(" ", (col("tok") +: (1 until n).map(i => col(s"t$i"))): _*).as("s"))
        .distinct()
    }
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle and
    * clearing `minJaccard`. `maxShingleDocFreq` caps the document frequency
    * of shingles (stop-shingle removal — see object doc); with a cap the
    * similarity is the Jaccard over the CAPPED shingle space — intersections
    * and set sizes both exclude stop-shingles, so the ratio stays
    * internally consistent. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, n: Int,
      minJaccard: Double, maxShingleDocFreq: Option[Int] = None): DataFrame = {
    // The index feeds three consumers (both join sides + sizes); persist so
    // the tokenize/window stage runs once, not three times. (Left persisted
    // for the session — unpersist from the caller once results are final.)
    val sh = shingleIndex(docs, idCol, textCol, n).persist()
    val joinable = maxShingleDocFreq match {
      case None => sh
      case Some(cap) =>
        val rare = sh.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("s")
        sh.join(rare, "s")
    }
    // sizes from the SAME (capped) index the intersections use
    val sizes = joinable.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = joinable.as("a")
      .join(joinable.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
  }

  /** Tall distinct (id, tid) token-id frame, ids from streaming xxhash64 —
    * the scale path (no dictionary materialization). */
  def tokenIdsByHash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .select(col("id"), hashTokenId(col("tok")).as("tid"))

  /** Token ids from a dense dictionary (row_number over sorted distinct
    * tokens). Cross-engine deterministic — used by the oracle queries; at
    * scale prefer [[tokenIdsByHash]] (the dictionary costs an extra shuffle
    * and a global sort of the vocabulary). */
  def tokenIdsByDictionary(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tall = docs.select(col(idCol).as("id"),
      explode(array_distinct(tokens(col(textCol)))).as("tok"))
    tall.join(tokenDictionary(docs, textCol), "tok").select("id", "tid")
  }

  /** Dense token dictionary (tok, tid): row_number over the sorted vocabulary.
    * The global sort bounds this to the vocabulary size, not the corpus. */
  def tokenDictionary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(array_distinct(tokens(col(textCol)))).as("tok")).distinct()
      .withColumn("tid", row_number().over(Window.orderBy("tok")).cast("long"))

  /** MinHash signature, tall form: (id, i, mh) for i ∈ [0, k) with
    * `mh = min_t h_i(t)` over the doc's token ids. */
  def minhash(tokenIds: DataFrame, k: Int): DataFrame =
    tokenIds
      .withColumn("i", explode(sequence(lit(0L), lit(k.toLong - 1))))
      .groupBy("id", "i")
      .agg(min(hashI(col("i"), col("tid"))).as("mh"))

  /** LSH banding over a tall minhash frame: docs agreeing on ALL rows of a
    * band share a bucket; emits distinct candidate pairs (id_a < id_b).
    * The band key is the ordered comma-join of the band's minhash values, so
    * the candidate search is a pure equi-join on (band, key). */
  def lshCandidates(minhashTall: DataFrame, rowsPerBand: Int): DataFrame = {
    // persisted: both self-join sides would otherwise recompute the whole
    // tokenize→minhash pipeline (session-lifetime cache; unpersist from the
    // caller once results are final)
    val banded = minhashTall
      .withColumn("band", expr(s"i div $rowsPerBand"))
      .groupBy("id", "band")
      .agg(array_join(transform(array_sort(collect_list(struct(col("i"), col("mh")))),
        x => x.getField("mh").cast("string")), ",").as("bkey"))
      .persist()
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Connected components by iterative min-label propagation: every node
    * ends up labeled with the smallest node id in its component — the
    * canonical-document assignment for near-dup clusters (edges from
    * [[jaccardPairs]] or [[lshCandidates]]).
    *
    * Each iteration is one join + one aggregation (shuffles on node id);
    * convergence takes graph-diameter iterations — near-dup graphs are
    * near-cliques, so 2-3 in practice. For billion-edge general graphs swap
    * in the large-star/small-star variant; the declared surface only needs
    * diameter-bounded dup clusters. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val bidir = (edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      unionByName edges.select(col("id_b").as("src"), col("id_a").as("dst"))).persist()
    var labels = nodes.select(col("id"), col("id").as("lbl")).persist()
    // labels only ever decrease, so Σlbl is strictly monotone until the
    // fixpoint — a one-aggregate convergence probe (no join with the
    // previous labels needed)
    var prevSum = labels.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val prop = bidir.join(labels, bidir("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.select("id", "lbl").unionByName(prop)
        .groupBy("id").agg(min("lbl").as("lbl")).persist()
      val nextSum = next.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
      labels.unpersist()
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    bidir.unpersist()
    // NOTE: the returned frame is persisted (the loop's lineage is deep —
    // recomputing it would replay every iteration); unpersist from the
    // caller once consumed
    labels.select(col("id"), col("lbl").as("component"))
  }

  /** SimHash over token ids: `bits`-wide sign-aggregated fingerprint.
    * h(t) = (2654435761·t + 40503) mod 2^32; bit j of the simhash is 1 iff
    * Σ_t (2·bit_j(h(t)) − 1) > 0. */
  def simhash(tokenIds: DataFrame, bits: Int = 16): DataFrame =
    tokenIds
      .withColumn("hh", pmod(lit(2654435761L) * norm(col("tid")) + 40503L, lit(4294967296L)))
      .withColumn("j", explode(sequence(lit(0), lit(bits - 1))))
      .withColumn("contrib",
        expr("pmod(hh div shiftleft(cast(1 as bigint), j), 2) * 2 - 1"))
      .groupBy("id", "j")
      .agg(sum(col("contrib")).as("s"))
      .groupBy("id")
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(cast(1 as bigint), j)")).otherwise(0L)).as("simhash"))
}
