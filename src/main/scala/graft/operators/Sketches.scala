package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate operators with exact rescore — the
  * two-pass shape every heavy aggregation takes at 100 TB: a fixed-size
  * sketch pass bounds the shuffle, an exact pass over the (tiny) candidate
  * set restores exactness. Same philosophy as the capped-then-rescored
  * Jaccard join (graft.llmops.Dedup.jaccardPairs).
  */
object Sketches {

  /** Count-min sketch of `keyCol` frequencies: `depth` hash rows ×
    * `width` buckets, as a DataFrame (d, b, c) with c = Σ multiplicity of
    * keys hashing to bucket b in row d. The groupBy is map-side-combined
    * into ≤ depth·width groups per task, so the SHUFFLE is fixed-size
    * (depth·width·|partitions| rows at worst) no matter how many rows or
    * distinct keys flow in — that is the whole point of sketching here. */
  def countMin(df: DataFrame, keyCol: String, depth: Int, width: Int,
      portable: Boolean = false): DataFrame = {
    val buckets = array((0 until depth).map { d =>
      if (portable) portableBucket(d, col(keyCol), width)
      else bucket(d, col(keyCol), width)
    }: _*)
    df.select(posexplode(buckets).as(Seq("d", "b")))
      .groupBy("d", "b").agg(count(lit(1)).as("c"))
  }

  /** Cross-engine bucket for oracle-gated sketches: 48 md5 bits parsed as
    * an integer mod width (the q83/q197 md5-arithmetic convention — DuckDB
    * spells it `('0x' || substr(md5(...), 1, 12))::BIGINT`). xxhash64 is
    * the at-scale default ([[bucket]]); md5 costs one digest per row but
    * hash-gates bit-for-bit against the SQL oracle. */
  def portableBucket(d: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(d.toString), lit(":"),
      key.cast("string"))), 1, 12), 16, 10).cast("long"), lit(width.toLong))

  /** K-minimum-values distinct sketch: the `k` smallest DISTINCT 48-bit
    * md5 hash values of `keyCol` (the q197 md5-arithmetic hash, so the
    * oracle reproduces every value), as one row
    * (n_seen, kth_hash, est_distinct) with the KMV estimator
    * est = (k−1)·2^48 div h_k (Bar-Yossef et al. 2002) and the exact
    * cardinality short-circuit when fewer than k distinct values exist.
    *
    * Scale: the distinct-by-hash aggregation is map-side combinable and
    * the k-smallest cut is a TakeOrdered (per-partition partial top-k,
    * k rows per partition to the driver-side merge) — the full distinct
    * set never sits in one task, and the estimate reads ONE row. The
    * "how many distinct keys are in this 100 TB column" answer at
    * sketch cost; (k−1)·2^48 ≈ 7.2e16 stays in BIGINT. */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2; got $k")
    val hashes = df.select(
      (conv(substring(md5(col(keyCol).cast("string")), 1, 12), 16, 10)
        .cast("long") + 1L).as("h"))
      .groupBy("h").agg(count(lit(1)).as("_dup")).select("h")
    val kSmallest = hashes.orderBy("h").limit(k)
    kSmallest.agg(count(lit(1)).as("n_seen"), max("h").as("kth_hash"))
      .select(col("n_seen"), col("kth_hash"),
        when(col("n_seen") < k, col("n_seen"))
          .otherwise(expr(s"((${k.toLong} - 1) * 281474976710656L) div kth_hash"))
          .as("est_distinct"))
  }

  private def bucket(d: Int, key: Column, width: Int): Column =
    pmod(xxhash64(lit(d), key), lit(width.toLong))

  /** Distributed Bloom filter over `keyCol`, materialized as a bitmap
    * DataFrame (w, bits): word w holds bits 64w..64w+63, OR-combined via the
    * `bit_or` aggregate. Fixed size (⌈mBits/64⌉ rows ≤ a few KB for
    * mBits = 2^20) regardless of input cardinality — the map-side partial
    * `bit_or` means the shuffle carries at most ⌈mBits/64⌉ rows per task,
    * like [[countMin]]. k hash functions = xxhash64 seeded by slot index. */
  def bloomBitmap(keys: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0 && k > 0)
    val pos = (0 until k).map(i => pmod(xxhash64(lit(i), col(keyCol)), lit(mBits.toLong)))
    keys.select(explode(array(pos: _*)).as("pos"))
      .select(expr("pos div 64").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
      .groupBy("w").agg(expr("bit_or(bit)").as("bits"))
  }

  /** Exact semi-join with a Bloom prefilter: rows of `facts` whose
    * `factKey` appears in `dim.dimKey`, computed as (1) k broadcast
    * hash-joins against the [[bloomBitmap]] of the dim keys — map-side,
    * no shuffle, eliminating the overwhelming majority of non-matching
    * fact rows where the dim side is selective — then (2) an exact
    * left-semi join over the surviving candidates only. The answer is
    * EXACT (a Bloom filter has no false negatives; the semi-join removes
    * its false positives); the bloom changes the PLAN: at 100 TB only
    * candidate rows reach the semi-join shuffle instead of the full fact
    * table. This is the manual form of the runtime-bloom-filter rewrite
    * Spark's `InjectRuntimeFilter` applies when statistics allow. */
  def bloomSemiJoin(facts: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, mBits: Int = 1 << 20, k: Int = 3): DataFrame = {
    val bitmap = bloomBitmap(dim.select(col(dimKey)), dimKey, mBits, k)
    var cur = facts
    for (i <- 0 until k) {
      val b = bitmap.select(col("w").as(s"__w$i"), col("bits").as(s"__bits$i"))
      cur = cur
        .withColumn(s"__pos$i", pmod(xxhash64(lit(i), col(factKey)), lit(mBits.toLong)))
        .withColumn(s"__w$i", expr(s"__pos$i div 64"))
        .join(broadcast(b), Seq(s"__w$i"), "left")
        // absent word ⇒ no dim key hashed there ⇒ definitely not a member
        .filter(coalesce(
          expr(s"(__bits$i & shiftleft(CAST(1 AS BIGINT), CAST(__pos$i % 64 AS INT))) <> 0"),
          lit(false)))
        .drop(s"__pos$i", s"__w$i", s"__bits$i")
    }
    cur.join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_semi")
  }

  /** Exact heavy hitters via CMS candidates + exact rescore: all keys of
    * `facts.keyCol` occurring ≥ `minCount` times, with their EXACT counts.
    *
    * `dimKeys` is the candidate key universe (e.g. the dimension table the
    * key references) with a column named `keyCol`. Pass 1 sketches the fact
    * stream (fixed-size shuffle, see [[countMin]]); each candidate key's
    * estimate = min over depth rows of its bucket count, which NEVER
    * underestimates (count-min guarantee), so `est >= minCount` keeps a
    * superset of the true heavy keys. Pass 2 exact-counts only facts whose
    * key survived — a semi-join against the (small) candidate set — and
    * applies the threshold exactly. Result: exact, with neither pass
    * shuffling the full key universe. */
  def heavyHitters(facts: DataFrame, keyCol: String, dimKeys: DataFrame,
      minCount: Long, depth: Int = 3, width: Int = 1024): DataFrame = {
    val sketch = countMin(facts, keyCol, depth, width)
    // estimate per candidate key: depth broadcast lookups, min-combined
    val est = (0 until depth).foldLeft(
        dimKeys.select(col(keyCol)).distinct()
          .withColumn("__est", lit(Long.MaxValue))) { (acc, d) =>
      val row = sketch.filter(col("d") === d).select(col("b").as("__b"), col("c").as("__c"))
      acc.withColumn("__b", bucket(d, col(keyCol), width))
        .join(broadcast(row), Seq("__b"), "left")
        .withColumn("__est", least(col("__est"), coalesce(col("__c"), lit(0L))))
        .drop("__b", "__c")
    }
    val cand = est.filter(col("__est") >= minCount).select(keyCol)
    facts.select(col(keyCol))
      .join(cand, Seq(keyCol), "left_semi")
      .groupBy(keyCol).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** HyperLogLog registers (p = 8, m = 256) for distinct-`keyCol` per
    * group — the mergeable fixed-size cardinality sketch every 100 TB
    * profiling pass keeps instead of a full distinct: register index =
    * first byte of md5(key), rho = 1 + number of leading zero BITS in the
    * next 32 md5 bits (an all-zero suffix pins rho = 33). Output is the
    * sketch itself, one row per (group, touched register):
    * (groupCols..., reg, max_rho) — absent registers are implicitly 0.
    *
    * Why registers and not the estimate: the max-combine over (group, reg)
    * is algebraic (map-side combined, shuffle ≤ m rows per group per task
    * — the [[countMin]] bound), registers from disjoint corpus shards merge
    * by a further max (union semantics), and the output is pure integers —
    * hash-stable across engines, while the harmonic-mean estimate is one
    * float formula away (see `hllEstimate`). The md5-hex bit decode uses
    * only portable string ops, so the DuckDB oracle reproduces every
    * register exactly. */
  def hllRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    hllTag(df.select(g :+ col(keyCol): _*), keyCol)
      .groupBy(g :+ col("reg"): _*).agg(max("rho").as("max_rho"))
  }

  /** Row-level HLL tagging: append the (reg, rho) columns for `keyCol`
    * without aggregating — the piece a STREAMING sketch reuses, since
    * `max(rho) by (window, reg)` is then an ordinary watermarked streaming
    * aggregation whose state is the sketch itself (≤ m rows per window,
    * not one row per distinct key). */
  def hllTag(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("hx", md5(col(keyCol).cast("string").cast("binary")))
      .withColumn("reg",
        (expr("instr('0123456789abcdef', substring(hx, 1, 1)) - 1") * 16 +
          expr("instr('0123456789abcdef', substring(hx, 2, 1)) - 1")).cast("long"))
      // 32-bit suffix as 8 hex nibbles; leading-zero count in nibbles, then
      // the first nonzero nibble contributes its own leading bits
      .withColumn("sfx", expr("substring(hx, 3, 8)"))
      .withColumn("rest", expr("TRIM(LEADING '0' FROM sfx)"))
      .withColumn("rho",
        when(col("rest") === "", lit(33L)).otherwise(
          (length(col("sfx")) - length(col("rest"))).cast("long") * 4 +
            expr("""CASE WHEN instr('0123456789abcdef', substring(rest, 1, 1)) - 1 >= 8 THEN 0
                         WHEN instr('0123456789abcdef', substring(rest, 1, 1)) - 1 >= 4 THEN 1
                         WHEN instr('0123456789abcdef', substring(rest, 1, 1)) - 1 >= 2 THEN 2
                         ELSE 3 END""").cast("long") + 1L))
      .drop("hx", "sfx", "rest")

  /** FracMinHash "scaled" signatures (the sourmash scheme, Irber et al.
    * 2022): a group's signature keeps a shingle iff the top `hexZeros`
    * hex digits of md5(shingle) are all zero — i.e. h < H/16^k, a
    * content-defined 16^-k sample of the shingle space. Unlike fixed-k
    * MinHash (bounded but resolution-capped), the signature GROWS with
    * distinct content (|sig| ≈ |shingles|/16^k), merges by plain set
    * union, and supports unbiased CONTAINMENT estimation — asymmetric
    * overlap, the quantity fixed-k MinHash cannot estimate well when set
    * sizes differ by orders of magnitude (the typical corpus-vs-corpus
    * case). Returns one row per distinct (grp, kept-hash).
    *
    * Scale: the filter runs scan-side (keep-rate 16^-k), so everything
    * downstream — distinct, sizes, the pair join — operates on the
    * sampled fraction; signatures for a 100 TB corpus at k=4 are ~2^-16
    * of its shingle count, small enough to broadcast per source. */
  def fracMinHashSignatures(docs: DataFrame, grpCol: String, idCol: String,
      textCol: String, n: Int, hexZeros: Int): DataFrame = {
    require(hexZeros >= 1 && hexZeros <= 8,
      s"hexZeros must be in [1, 8], got $hexZeros")
    val sh = graft.llmops.Dedup.shingleIndex(docs, idCol, textCol, n)
    val grp = docs.select(col(idCol).as("id"), col(grpCol).as("grp"))
    sh.join(grp, "id")
      .select(col("grp"), md5(col("s").cast("binary")).as("h"))
      .filter(substring(col("h"), 1, hexZeros) === lit("0" * hexZeros))
      .distinct()
  }

  /** Pairwise containment / Jaccard estimates between group signatures
    * ([[fracMinHashSignatures]]): for every unordered group pair, the
    * shared kept-hash count with both directed containments and the
    * Jaccard estimate, in exact integer ppm over the kept hashes
    * (the estimator ratios are exact; only their relation to the true
    * full-set values is sampling-approximate — stated, like q20).
    * EVERY unordered pair of input groups is included — zero-overlap
    * pairs (the "no leakage between A and B" readout is the point of the
    * audit) AND groups whose sampled signature came out empty (plausible
    * for a small source at a coarse keep rate): group keys derive from
    * the input docs, not from the surviving hashes, so an empty-signature
    * source surfaces with sig=0 and NULL ppm estimates (a 0-hash sample
    * estimates nothing — NULL, not 0) rather than silently vanishing
    * from the audit. The pair frame is |groups|² METADATA scale (sizes
    * only); the data-bearing join is hash-keyed equi on the sampled
    * signatures. */
  def fracMinHashContainment(docs: DataFrame, grpCol: String, idCol: String,
      textCol: String, n: Int, hexZeros: Int): DataFrame = {
    val sig = fracMinHashSignatures(docs, grpCol, idCol, textCol, n, hexZeros)
    val sizes = docs.select(col(grpCol).as("grp")).distinct()
      .join(sig.groupBy("grp").agg(count(lit(1)).as("size")), Seq("grp"), "left")
      .withColumn("size", coalesce(col("size"), lit(0L)))
    val pairs = sizes.select(col("grp").as("grp_a"), col("size").as("sig_a"))
      .join(broadcast(sizes.select(col("grp").as("grp_b"), col("size").as("sig_b"))),
        col("grp_a") < col("grp_b"))
    val shared = sig.as("a")
      .join(sig.as("b"),
        col("a.h") === col("b.h") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs.join(shared, Seq("grp_a", "grp_b"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("containment_ab_ppm", when(col("sig_a") === 0L, lit(null))
        .otherwise(expr("(n_shared * 1000000) div sig_a")))
      .withColumn("containment_ba_ppm", when(col("sig_b") === 0L, lit(null))
        .otherwise(expr("(n_shared * 1000000) div sig_b")))
      .withColumn("jaccard_ppm",
        when(col("sig_a") + col("sig_b") === 0L, lit(null))
          .otherwise(expr("(n_shared * 1000000) div (sig_a + sig_b - n_shared)")))
      .select("grp_a", "grp_b", "sig_a", "sig_b", "n_shared",
        "containment_ab_ppm", "containment_ba_ppm", "jaccard_ppm")
  }

  /** Client-side HLL estimate from [[hllRegisters]] rows of ONE group:
    * the standard α·m²/Σ2^-M[j] with linear counting below 2.5m — here for
    * spec-level validation against exact distincts (the engine keeps
    * registers, not estimates). */
  def hllEstimate(maxRhoByReg: Map[Long, Long], m: Int = 256): Double = {
    val zeros = m - maxRhoByReg.size
    val sum = maxRhoByReg.values.map(r => math.pow(2.0, -r.toDouble)).sum + zeros.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
