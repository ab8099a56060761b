package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.llmops.{Corpus, Dedup}
import graft.operators.Sketches

/** Round-5 continuation operators: hash split, token-budget caps,
  * duplicated-span coverage, HLL registers, Z-order interleave. */
class ScaleOpsSpec extends AnyFunSuite with SparkSpec {

  // ------------------------------------------------------------ hash split

  test("hashSplit: partitions the corpus, deterministic, ~80/10/10") {
    import spark.implicits._
    val docs = (1L to 2000L).toDF("doc_id")
    val got = Corpus.hashSplit(docs, "doc_id")
    assert(got.count() == 2000)
    val byId = got.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId.size == 2000) // exactly one split per id
    val frac = got.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 2000.0).toMap
    assert(math.abs(frac("train") - 205.0 / 256) < 0.03)
    assert(math.abs(frac("val") - 26.0 / 256) < 0.02)
    assert(math.abs(frac("test") - 25.0 / 256) < 0.02)
    // stability: the same id gets the same split regardless of corpus size
    val sub = Corpus.hashSplit((1L to 100L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    sub.foreach { case (id, sp) => assert(byId(id) == sp) }
    // buckets stay in [0, 256)
    assert(got.agg(min("bucket"), max("bucket")).collect().head.getLong(0) >= 0)
    assert(got.agg(max("bucket")).collect().head.getLong(0) <= 255)
  }

  test("hashSplitBy: one split per group; singletons reduce to hashSplit's assignment") {
    import spark.implicits._
    // groups of 3 ids sharing a key: (1,2,3)->1, (4,5,6)->4, ...
    val df = (1L to 300L).map(i => (i, ((i - 1) / 3) * 3 + 1)).toDF("id", "component")
    val got = Corpus.hashSplitBy(df, "component").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSeq
    // leakage invariant: every member of a group gets the GROUP's split
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.size == 1, s"group split leaked: $rows")
    }
    // keyed on itself ≡ plain hashSplit
    val byId = Corpus.hashSplit((1L to 300L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    got.filter(r => r._1 == r._2).foreach { case (id, _, sp) =>
      assert(byId(id) == sp)
    }
  }

  // ------------------------------------------------------ token-budget cap

  test("capTokenBudget: greedy admission stops once the budget is spent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "one two three"),      // 3 tokens
      (2L, "a", "four five"),          // 2 tokens
      (3L, "a", "six seven eight nine"), // 4 tokens
      (4L, "b", "ten")                 // 1 token
    ).toDF("doc_id", "source", "text")
    val got = Corpus.capTokenBudget(docs, "doc_id", "source", "text", budget = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong,
        r.getLong(3), r.getLong(4)))
    // stratum a admits docs in hash order until cum_before >= 5; the last
    // admitted doc may overrun (admit-if-any-budget-remains)
    val a = got.filter(_._1 == "a")
    assert(a.forall(_._5 < 5L)) // every admitted row had budget remaining
    assert(a.map(_._3).sorted.sameElements(1L to a.length)) // contiguous ranks
    val aTokens = a.map(_._4).sum
    assert(aTokens >= 5L || a.length == 3) // budget spent or stratum exhausted
    // a stratum under budget keeps everything
    assert(got.count(_._1 == "b") == 1)
  }

  test("capTokenBudget: every nonempty stratum admits at least one document") {
    import spark.implicits._
    val docs = Seq((1L, "x", "a b c d e f g h i j"), (2L, "y", "k l m n o p q r s t"))
      .toDF("doc_id", "source", "text")
    val got = Corpus.capTokenBudget(docs, "doc_id", "source", "text", budget = 1L)
    assert(got.count() == 2) // one per stratum, despite 10-token docs vs budget 1
  }

  // ------------------------------------------------- dup-span coverage

  test("dupSpanCoverage: cross-document spans covered, within-doc repeats ignored") {
    import spark.implicits._
    val shared = "alpha beta gamma" // the duplicated 3-gram
    val docs = Seq(
      (1L, s"$shared zero one"),         // 5 tokens, positions 0-2 covered
      (2L, s"two three $shared"),        // 5 tokens, positions 2-4 covered
      (3L, "solo solo solo solo solo"),  // within-doc repetition only: df=1
      (4L, "unique text here")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanCoverage(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((5L, 3L, 600L))) // 3 of 5 positions → 600‰
    assert(got(2L) == ((5L, 3L, 600L)))
    assert(got(3L) == ((5L, 0L, 0L)))   // "solo solo solo" recurs only within doc 3
    assert(got(4L) == ((3L, 0L, 0L)))
  }

  test("selfRepeatCoverage: first occurrences free, later repeats covered") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c x y a b c z"),        // trigram (a b c) at pos 0 and 5 → 5,6,7 covered
      (2L, "solo solo solo solo solo"), // trigrams at 0,1,2 identical → pos 1-4 covered
      (3L, "all tokens distinct here"), // clean document
      (4L, "tiny doc")                  // shorter than n: no grams at all
    ).toDF("doc_id", "text")
    val got = Dedup.selfRepeatCoverage(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((9L, 3L, 333L)))
    assert(got(2L) == ((5L, 4L, 800L))) // repeats at pos 1,2 cover positions 1-4
    assert(got(3L) == ((4L, 0L, 0L)))
    assert(got(4L) == ((2L, 0L, 0L)))
  }

  test("selfRepeatCoverage: cross-document duplication alone scores zero") {
    import spark.implicits._
    // same text in two docs — dupSpanCoverage flags it, selfRepeatCoverage must not
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val got = Dedup.selfRepeatCoverage(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 0L && got(2L) == 0L)
  }

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunkDedup: first corpus-wide occurrence keeps, later copies drop, docs reassemble") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"), // chunks "a b","c d" — both first occurrences
      (2L, "a b x y"), // "a b" already seen in doc 1 → dropped; "x y" kept
      (3L, "c d"),     // whole doc is a repeat → rewritten to empty
      (4L, "e")        // trailing partial chunk kept
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, "doc_id", "text", chunkLen = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 2L, sha256Hex("a b c d"))))
    assert(got(2L) == ((2L, 1L, sha256Hex("x y"))))
    assert(got(3L) == ((1L, 0L, sha256Hex(""))))
    assert(got(4L) == ((1L, 1L, sha256Hex("e"))))
  }

  test("chunkDedup: within-document verbatim repeats dedup too; empty docs surface") {
    import spark.implicits._
    val docs = Seq((1L, "p q p q"), (2L, "")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, "doc_id", "text", chunkLen = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 1L, sha256Hex("p q"))))
    assert(got(2L) == ((0L, 0L, sha256Hex(""))))
  }

  test("dupSpanCoverage: overlapping duplicated grams count positions once") {
    import spark.implicits._
    // "a b c d" appears in both docs → doc 1 grams (a b c) and (b c d) both
    // duplicated; coverage = 4 distinct positions, not 6
    val docs = Seq((1L, "a b c d x"), (2L, "y a b c d")).toDF("doc_id", "text")
    val got = Dedup.dupSpanCoverage(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 4L)
    assert(got(2L) == 4L)
  }

  // ------------------------------------------------------- HLL registers

  test("hllRegisters: estimate within 10% of a 5000-key exact distinct") {
    import spark.implicits._
    val keys = (1L to 5000L).map(i => ("g", i)).toDF("grp", "k")
    val regs = Sketches.hllRegisters(keys, "k", Seq("grp")).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(regs.size <= 256)
    assert(regs.values.forall(r => r >= 1 && r <= 33))
    val est = Sketches.hllEstimate(regs)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.10, s"estimate $est")
  }

  test("hllRegisters: shard-merged registers equal whole-corpus registers") {
    import spark.implicits._
    val all = (1L to 2000L).map(i => ("g", i)).toDF("grp", "k")
    val whole = Sketches.hllRegisters(all, "k", Seq("grp")).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // split into two shards, sketch each, merge by max — the union contract
    val s1 = Sketches.hllRegisters(all.filter($"k" <= 1000L), "k", Seq("grp"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val s2 = Sketches.hllRegisters(all.filter($"k" > 1000L), "k", Seq("grp"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val merged = (s1.keySet ++ s2.keySet).map(k =>
      k -> math.max(s1.getOrElse(k, 0L), s2.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("fracMinHash: content-defined subset — B ⊆ A content gives sig_B ⊆ sig_A and containment_ba = 1e6") {
    import spark.implicits._
    // source B's docs are a verbatim subset of source A's; C is disjoint.
    // FracMinHash keeps a shingle by its own hash, so the subset relation
    // survives sampling EXACTLY (the property fixed-k MinHash lacks).
    val base = (1 to 40).map(i =>
      s"alpha bravo$i charlie delta$i echo foxtrot golf$i hotel india juliet")
    val docs = (
      base.zipWithIndex.map { case (t, i) => (i.toLong, "A", t) } ++
      base.take(10).zipWithIndex.map { case (t, i) => (100L + i, "B", t) } ++
      (1 to 40).map(i => (200L + i.toLong, "C",
        s"kilo lima$i mike november$i oscar papa quebec$i romeo sierra tango"))
    ).toDF("doc_id", "source", "text")
    val rows = Sketches.fracMinHashContainment(docs, "source", "doc_id", "text",
        n = 3, hexZeros = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val (sigA, sigB, sharedAB, _, contBA) = rows(("A", "B"))
    assert(sharedAB == sigB, "B's kept hashes must ALL appear in A's signature")
    assert(contBA == 1000000L, s"containment of B in A must be exact 1e6, got $contBA")
    assert(sigA > sigB, "A has strictly more distinct content than B")
    // disjoint pair surfaces with zero overlap (the 'no leakage' readout)
    val (_, _, sharedAC, contAC, contCA) = rows(("A", "C"))
    assert(sharedAC == 0L && contAC == 0L && contCA == 0L)
  }

  // ------------------------------------------------------ Z-order interleave

  test("zorder2: matches the bit-by-bit reference interleave") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (255L, 256L), (43690L, 21845L))
    val got = samples.toDF("x", "y")
      .select(GraftFunctions.zorder2($"x", $"y").as("z"))
      .collect().map(_.getLong(0))
    assert(got.sameElements(samples.map { case (x, y) => ref(x, y) }))
  }

  test("zorder2: out-of-range input raises instead of aliasing") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq((65536L, 0L)).toDF("x", "y")
        .select(GraftFunctions.zorder2($"x", $"y")).collect()
    }
    assert(err.getMessage != null)
  }

  test("zorder2 reaches the SQL surface via registerSql") {
    org.apache.spark.sql.graft.Bridge.registerSql(spark)
    // interleave(3=0b11, 5=0b101): x bits → 0b0101, y bits → 0b100010 ⇒ 0b100111 = 39
    assert(spark.sql("SELECT zorder2(3L, 5L)").collect().head.getLong(0) == 39L)
  }

  test("zorder2: z-range buckets bound both key ranges (the zone-map property)") {
    import spark.implicits._
    // a 64×64 grid z-bucketed into 16 buckets of 256 codes: every bucket's
    // (x, y) bounding box is exactly 16×16 — proof that z-sorted file stats
    // prune on either dimension
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val spans = grid.select($"x", $"y", GraftFunctions.zorder2($"x", $"y").as("z"))
      .groupBy(expr("z div 256").as("zb"))
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    assert(spans.length == 16)
    assert(spans.forall(r => r.getLong(1) == 15L && r.getLong(2) == 15L))
  }

  test("q214 co-occurrence lift: matches an in-memory basket recomputation at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val cItem = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nOrders = byOrder.size.toLong
    val cij = byOrder.values.toSeq
      .flatMap(items => for (a <- items; b <- items if a != b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2L).toMap
    val want = cij.groupBy(_._1._1).flatMap { case (i, m) =>
      m.toSeq.map { case ((_, j), c) =>
        val lift = (BigInt(nOrders) * c * 1000000 /
          (BigInt(cItem(i)) * cItem(j))).toLong
        (j, c, lift)
      }.sortBy { case (j, _, lift) => (-lift, j) }.take(5).zipWithIndex
        .map { case ((j, c, lift), rk) => (i, j) -> ((c, lift, rk + 1L)) }
    }
    val got = graft.queries.Scale.q214ItemCooccur(spark, sf).collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Long]("item_b")) ->
        ((r.getAs[Long]("c_ij"), r.getAs[Long]("lift_ppm"), r.getAs[Long]("rk"))))
      .toMap
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q242 KMV: hashes, kth value, and both estimator branches equal the hand recompute") {
    val sf = "/root/testdata/sf0.001"
    val parts = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey").collect().map(_.getLong(0))
    val hashes = parts.distinct
      .map(p => java.lang.Long.parseLong(md5Hex(p.toString).take(12), 16) + 1L)
      .distinct.sorted
    val row = graft.queries.Scale.q242KmvDistinct(spark, sf).collect().head
    val k = 256
    val nSeen = math.min(k, hashes.length).toLong
    assert(row.getAs[Long]("n_seen") == nSeen)
    assert(row.getAs[Long]("kth_hash") == hashes.take(k).max)
    val est =
      if (nSeen < k) nSeen
      else (k - 1L) * 281474976710656L / hashes(k - 1)
    assert(row.getAs[Long]("est_distinct") == est)
    assert(row.getAs[Long]("exact_distinct") == parts.distinct.length.toLong)
    // sf0.001 has < 256 distinct parts: this pins the short-circuit branch
    assert(nSeen < k && est == parts.distinct.length.toLong)
    // the estimating branch, pinned on a synthetic frame with > k values
    import spark.implicits._
    val big = (1L to 2000L).toDF("v")
    val bigHashes = (1L to 2000L)
      .map(p => java.lang.Long.parseLong(md5Hex(p.toString).take(12), 16) + 1L)
      .distinct.sorted
    val bigRow = Sketches.kmvDistinct(big, "v", k).collect().head
    val bigEst = (k - 1L) * 281474976710656L / bigHashes(k - 1)
    assert(bigRow.getAs[Long]("est_distinct") == bigEst)
    // the estimate lands within 25% of the truth for this k
    assert(math.abs(bigEst - 2000L) < 500L, s"estimate $bigEst off for 2000")
  }

  test("q243 count-min: estimates equal the hand sketch; over >= 0 always (CM guarantee)") {
    val sf = "/root/testdata/sf0.001"
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").collect().map(_.getLong(0))
    val width = 64
    def bucket(d: Int, u: Long): Long =
      java.lang.Long.parseLong(md5Hex(s"$d:$u").take(12), 16) % width
    val sketch = scala.collection.mutable.Map.empty[(Int, Long), Long]
    users.foreach { u =>
      (0 until 4).foreach { d =>
        sketch((d, bucket(d, u))) = sketch.getOrElse((d, bucket(d, u)), 0L) + 1
      }
    }
    val exact = users.groupBy(identity).map { case (u, v) => u -> v.length.toLong }
    val want = exact.keys.filter(_ % 7 == 0).map { u =>
      u -> ((exact(u), (0 until 4).map(d => sketch((d, bucket(d, u)))).min))
    }.toMap
    val got = graft.queries.Scale.q243CountMin(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("exact"), r.getAs[Long]("est")))).toMap
    assert(got == want)
    assert(got.values.forall { case (ex, est) => est >= ex },
      "count-min never underestimates")
  }

  test("q302 KMV set ops: sample, overlap, and both estimators equal the hand recompute") {
    val sf = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
      .filter(col("y").isin(1995, 1996))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    def h(x: Long): Long =
      java.lang.Long.parseLong(md5Hex(x.toString).take(12), 16) + 1L
    val aSet = orders.filter(_._2 == 1995).map(t => h(t._1)).toSet
    val bSet = orders.filter(_._2 == 1996).map(t => h(t._1)).toSet
    val k = 256
    val union = (aSet ++ bSet).toSeq.sorted
    val sample = union.take(k)
    val nSeen = sample.length.toLong
    val nBoth = sample.count(x => aSet(x) && bSet(x)).toLong
    val custs = orders.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exactUnion = custs.size.toLong
    val exactInter = custs.values.count(s => s(1995) && s(1996)).toLong
    val estUnion =
      if (nSeen < k) nSeen else (k - 1L) * 281474976710656L / sample.last
    val row = graft.queries.Scale.q302KmvSetOps(spark, sf).collect().head
    assert(row.getAs[Long]("n_seen") == nSeen)
    assert(row.getAs[Long]("n_both") == nBoth)
    assert(row.getAs[Long]("est_union") == estUnion)
    assert(row.getAs[Long]("est_intersection") == estUnion * nBoth / nSeen)
    assert(row.getAs[Long]("est_jaccard_ppm") == nBoth * 1000000L / nSeen)
    assert(row.getAs[Long]("exact_union") == exactUnion)
    assert(row.getAs[Long]("exact_intersection") == exactInter)
    assert(row.getAs[Long]("exact_jaccard_ppm") ==
      exactInter * 1000000L / exactUnion)
    // sf0.001 keeps n_seen < k: the short-circuit branch is the exact union
    assert(nSeen < k && estUnion == exactUnion)
  }
}
