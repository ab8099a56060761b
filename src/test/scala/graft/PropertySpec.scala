package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.FreshReader
import graft.model.{ColumnName, DataRequest}
import graft.policy.ShelfLife
import graft.registry.FreshnessManager

/** Property tests (SURVEY.md §5): freshen-twice ≡ freshen-once (the demo's
  * idempotence pinned over RANDOM fixtures), and cell-merge invariants. */
class PropertySpec extends AnyFunSuite with SparkSpec {

  private case class Fixture(rows: List[(String, List[(Long, Long)])],
      shelf: Long, asOf: Long)

  private val genFixture: Gen[Fixture] = for {
    n <- Gen.choose(1, 6)
    rows <- Gen.listOfN(n, for {
      nv <- Gen.choose(0, 4)
      vers <- Gen.listOfN(nv, Gen.zip(Gen.choose(0L, 1000L), Gen.choose(0L, 100L)))
    } yield vers)
    shelf <- Gen.choose(1L, 1200L)
    asOf <- Gen.choose(500L, 2000L)
  } yield Fixture(rows.zipWithIndex.map { case (v, i) => (s"e$i", v) }, shelf, asOf)

  private def toView(f: Fixture): DataFrame = {
    import spark.implicits._
    f.rows.toDF("entity_id", "info_visits")
      .withColumn("info_visits", expr(
        "reverse(array_sort(transform(info_visits, v -> named_struct('ts', v._1, 'value', v._2))))"))
  }

  private def freshenOnce(view: DataFrame, f: Fixture): DataFrame = {
    val m = new FreshnessManager(_ => Some(view.schema))
    m.storePolicy("user", ColumnName("info:visits"),
      classOf[VisitsIncrement].getName, new ShelfLife(f.shelf))
    FreshReader.builder(m).withTable("user", view).withAsOf(f.asOf).build()
      .freshenAll(DataRequest(Seq(ColumnName("info:visits"))))
  }

  private def snapshot(df: DataFrame): Map[String, Seq[(Long, Long)]] =
    df.select(col("entity_id"), expr("transform(info_visits, v -> struct(v.ts, v.value))"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1))))
      .toMap

  test("property: freshen is idempotent at a fixed clock (second run is a no-op)") {
    val prop = Prop.forAll(genFixture) { f =>
      val once = freshenOnce(toView(f), f)
      val twice = freshenOnce(once, f)
      snapshot(once) == snapshot(twice)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: freshen preserves entity set and appends at most one version") {
    val prop = Prop.forAll(genFixture) { f =>
      val before = snapshot(toView(f))
      val after = snapshot(freshenOnce(toView(f), f))
      after.keySet == before.keySet &&
        after.forall { case (e, vs) =>
          val b = before(e)
          vs == b || (vs.size == b.size + 1 && vs.tail == b && vs.head._1 == f.asOf)
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: prefix-filtered Jaccard ≡ all-pairs Jaccard on random corpora") {
    import spark.implicits._
    import graft.llmops.Dedup
    // random docs over a small vocabulary (so shingles collide and the
    // prefix filter actually prunes), several near-dup copies mixed in
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val genDocs: Gen[List[String]] = for {
      n <- Gen.choose(2, 8)
      base <- Gen.listOfN(n, Gen.choose(3, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
      dups <- Gen.someOf(base)
    } yield base ++ dups // exact copies guarantee some J ≥ t pairs exist
    def pairsOf(df: DataFrame, prefix: Boolean): Set[(Long, Long, Long)] =
      Dedup.jaccardPairs(df, "doc_id", "text", n = 2, minJaccard = 0.6,
          prefixFilter = prefix)
        .select("id_a", "id_b", "n_inter").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val prop = Prop.forAll(genDocs) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      pairsOf(df, prefix = true) == pairsOf(df, prefix = false)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: prefix-filtered containment ≡ brute-force directed containment") {
    import spark.implicits._
    import graft.llmops.Dedup
    import org.apache.spark.sql.functions._
    // The asymmetric-prefix losslessness claim (Dedup.containmentPairs
    // scaladoc): truncating only the contained side A to its first
    // n_A − ⌈t·n_A⌉ + 1 shingles in (df, s) order drops no directed pair
    // the full cross of shingle sets would keep. Brute force = explode
    // both sides fully, count common shingles, divide by |sh(A)|.
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val genDocs: Gen[List[String]] = for {
      n <- Gen.choose(2, 8)
      base <- Gen.listOfN(n, Gen.choose(3, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
      dups <- Gen.someOf(base)
    } yield base ++ dups
    def brute(df: DataFrame, t: Double): Set[(Long, Long, Long)] = {
      val sh = Dedup.shingleIndex(df, "doc_id", "text", 2)
      val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
      sh.as("a").join(sh.as("b"), col("a.s") === col("b.s") && col("a.id") =!= col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("n_inter"))
        .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .filter(col("n_inter").cast("double") / col("n_a").cast("double") >= t)
        .select("id_a", "id_b", "n_inter").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    def viaPrefix(df: DataFrame, t: Double): Set[(Long, Long, Long)] =
      Dedup.containmentPairs(df, "doc_id", "text", n = 2, minContainment = t)
        .select("id_a", "id_b", "n_inter").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val prop = Prop.forAll(genDocs, Gen.oneOf(0.6, 0.8, 0.9, 1.0)) { (texts, t) =>
      val df = texts.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("doc_id", "text")
      viaPrefix(df, t) == brute(df, t)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("containment: short doc embedded in long one scores ≈1 while Jaccard stays low") {
    import spark.implicits._
    import graft.llmops.Dedup
    // The quote-page behavior the scaladoc advertises: doc 1 is doc 0's
    // text verbatim inside a much longer page. C(1→0 direction embedded
    // in the long page) ≈ 1; symmetric Jaccard is |B|-dominated and low.
    val short = "alpha beta gamma delta eps zeta"
    val long = ("x" + (1 to 40).map(i => s" filler$i").mkString) + " " + short + " tail one two"
    val df = Seq((0L, long), (1L, short)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", n = 2, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSeq
    // directed: the SHORT doc (1) is contained in the long one (0); the
    // reverse direction must NOT appear at t=0.9
    assert(cont.map(c => (c._1, c._2)) == Seq((1L, 0L)), cont.toString)
    assert(cont.head._3 >= 0.9)
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", n = 2, minJaccard = 0.5)
      .collect()
    assert(jac.isEmpty, "symmetric Jaccard should miss the quote-page pair")
  }

  test("property: deletion-neighborhood fuzzy join ≡ brute-force levenshtein join") {
    import spark.implicits._
    import graft.llmops.Dedup
    import org.apache.spark.sql.functions._
    // The FastSS/SymSpell losslessness claim (Dedup.fuzzyPairs scaladoc):
    // joining delete-≤d variant sets finds EVERY pair with lev ≤ d. Tiny
    // alphabet + short strings so near-misses actually occur; duplicates
    // of strings are allowed (distinct ids, identical text → dist 0).
    val genStrs: Gen[List[String]] = for {
      n <- Gen.choose(2, 10)
      base <- Gen.listOfN(n, Gen.choose(1, 7).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    } yield base
    def brute(df: DataFrame, d: Int): Set[(Long, Long, Int)] =
      df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
        .withColumn("dist", levenshtein(col("a.str"), col("b.str")))
        .filter(col("dist") <= d)
        .select(col("a.id"), col("b.id"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def viaIndex(df: DataFrame, d: Int): Set[(Long, Long, Int)] =
      Dedup.fuzzyPairs(df, "id", "str", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val prop = Prop.forAll(genStrs, Gen.oneOf(1, 2)) { (strs, d) =>
      val df = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "str")
      viaIndex(df, d) == brute(df, d)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("noveltyCurve: first doc fully novel, verbatim copy scores zero") {
    import spark.implicits._
    import graft.llmops.Dedup
    val a = "alpha beta gamma delta eps"
    val b = "zeta eta theta iota kappa"
    val df = Seq((0L, a), (1L, a), (2L, b), (3L, a + " " + b)).toDF("doc_id", "text")
    val got = Dedup.noveltyCurve(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == (3L, 3L))     // first occurrence of everything
    assert(got(1L) == (3L, 0L))     // verbatim copy: nothing novel
    assert(got(2L) == (3L, 3L))     // disjoint vocabulary: fully novel
    // concat doc: only the 2 bridge trigrams spanning the a|b seam are new
    assert(got(3L) == (8L, 2L))
  }

  test("property: integer k-means ≡ naive in-memory Lloyd reference") {
    import spark.implicits._
    import graft.llmops.Similarity
    // Exact arithmetic means the distributed plan must agree with a naive
    // single-machine fold BIT-FOR-BIT: same quantization, same (dist2, cid)
    // argmin tie-break, same floor-div centroid means.
    val scale = Similarity.ExactScale
    def quant(v: Float): Long = {
      val d = v.toDouble
      (math.signum(d) * math.floor(math.abs(d) * scale + 0.5)).toLong
    }
    def reference(vecs: Map[Long, Array[Long]], k: Int, iters: Int): Map[Long, (Long, Long)] = {
      var cents: Map[Long, Array[Long]] =
        vecs.filter(_._1 < k).map { case (id, x) => id -> x }
      def assign(): Map[Long, (Long, Long)] = vecs.map { case (id, x) =>
        val scored = cents.toSeq.map { case (cid, c) =>
          val d2 = x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          (d2, cid)
        }.sorted
        id -> (scored.head._2, scored.head._1)
      }
      for (_ <- 1 until iters) {
        val a = assign()
        cents = vecs.groupBy { case (id, _) => a(id)._1 }.map { case (cid, members) =>
          val dims = members.head._2.length
          cid -> Array.tabulate(dims) { i =>
            val sx = members.valuesIterator.map(_(i)).sum
            Math.floorDiv(sx, members.size.toLong)
          }
        }
      }
      assign()
    }
    val genVecs: Gen[List[Array[Float]]] = for {
      n <- Gen.choose(4, 16)
      vs <- Gen.listOfN(n, Gen.listOfN(4,
        Gen.choose(-1000, 1000).map(_ / 1000.0f)).map(_.toArray))
    } yield vs
    val prop = Prop.forAll(genVecs) { vs =>
      val k = 3
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toDF("id", "vec")
      val got = Similarity.kmeansIntAssign(df, k, iters = 2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = reference(
        vs.zipWithIndex.map { case (v, i) => i.toLong -> v.map(quant) }.toMap, k, 2)
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: gram digests ≡ gram strings on random corpora (probe equivalence)") {
    import spark.implicits._
    import graft.streaming.StreamDecontam
    import org.apache.spark.sql.functions._
    // the digest probe must flag exactly the docs (with exactly the counts)
    // the string probe flags — shared vocab so grams actually collide
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val genCase = for {
      nc <- Gen.choose(1, 6)
      corpus <- Gen.listOfN(nc, Gen.choose(1, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
      ev <- Gen.choose(1, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
    } yield (corpus, ev)
    val prop = Prop.forAll(genCase) { case (corpus, ev) =>
      val cdf = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val edf = Seq((100L, ev)).toDF("id", "text")
      val n = 3
      val viaStrings = cdf.select(col("id"), explode(StreamDecontam.gramSet(col("text"), n)).as("s"))
        .join(edf.select(explode(StreamDecontam.gramSet(col("text"), n)).as("s")).distinct(), "s")
        .groupBy("id").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaDigests = StreamDecontam.sharedGrams(cdf,
          edf.select(explode(StreamDecontam.gramDigests(col("text"), n)).as("h")).distinct(), n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      viaStrings == viaDigests
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: prefix-filter + df-cap ≡ df-cap alone on random corpora") {
    import spark.implicits._
    import graft.llmops.Dedup
    // Combined-knob losslessness claim (Dedup.jaccardPairs scaladoc): the
    // prefix, though sized from the FULL set, drops no pair the cap-only
    // index would keep. Small vocab ⇒ high dfs ⇒ the cap actually removes
    // shingles AND the prefix actually prunes, so the interaction is real.
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val genDocs: Gen[List[String]] = for {
      n <- Gen.choose(2, 8)
      base <- Gen.listOfN(n, Gen.choose(3, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
      dups <- Gen.someOf(base)
    } yield base ++ dups
    def pairsOf(df: DataFrame, cap: Int, prefix: Boolean): Set[(Long, Long, Long)] =
      Dedup.jaccardPairs(df, "doc_id", "text", n = 2, minJaccard = 0.6,
          maxShingleDocFreq = Some(cap), prefixFilter = prefix)
        .select("id_a", "id_b", "n_inter").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val prop = Prop.forAll(genDocs, Gen.choose(1, 6)) { (texts, cap) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      pairsOf(df, cap, prefix = true) == pairsOf(df, cap, prefix = false)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("star-contraction CC raises instead of returning truncated labels") {
    import spark.implicits._
    import graft.llmops.Dedup
    // a 6-node path needs >1 star round; maxRounds = 1 must throw, not
    // silently emit a non-star edge set as components
    val nodes = (0L to 5L).toDF("id")
    val edges = (0L to 4L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponentsStars(nodes, edges, maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("property: star-contraction CC ≡ min-label CC on random graphs") {
    import spark.implicits._
    import graft.llmops.Dedup
    val genGraph: Gen[(List[Long], List[(Long, Long)])] = for {
      n <- Gen.choose(1, 12)
      nodes = (0L until n.toLong).toList
      ne <- Gen.choose(0, 14)
      edges <- Gen.listOfN(ne, Gen.zip(Gen.choose(0L, n.toLong - 1), Gen.choose(0L, n.toLong - 1)))
    } yield (nodes, edges.filter(e => e._1 != e._2))
    val prop = Prop.forAll(genGraph) { case (nodes, edges) =>
      val nodesDf = nodes.toDF("id")
      val edgesDf = edges.toDF("id_a", "id_b")
      val stars = Dedup.connectedComponentsStars(nodesDf, edgesDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val minLabel = Dedup.connectedComponents(nodesDf, edgesDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      stars == minLabel
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("approx_count_distinct tracks the exact count within its error bound (S9)") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val exact = o.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = o.select(approx_count_distinct(col("o_custkey"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  // ---- closed-form pivot quantizer (q43/q67 coarse stage) ----

  import graft.llmops.Similarity

  // non-zero magnitudes so no vector quantizes to all-zeros (a zero norm
  // would make cosines NaN and the monotonicity comparison vacuous)
  private val genVecs: Gen[List[Array[Float]]] = for {
    n <- Gen.choose(8, 24)
    vecs <- Gen.listOfN(n, Gen.listOfN(8, for {
      m <- Gen.chooseNum(0.1f, 1.0f)
      s <- Gen.oneOf(-1f, 1f)
    } yield m * s))
  } yield vecs.map(_.toArray)

  private def vecDf(vs: List[Array[Float]]): DataFrame = {
    import spark.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
  }

  private def q8(x: Float): Long = {
    val d = x.toDouble
    (math.signum(d) * math.floor(math.abs(d) * 1e8 + 0.5)).toLong
  }

  /** Naive driver-side model of the pivot assignment: hash-ordered pivot
    * ids, exact integer dots, argmax with ties to the lowest pivot. */
  private def naiveCells(vs: List[Array[Float]], nlist: Int): Map[Long, Long] = {
    val ids = vs.indices.map(_.toLong)
    val pivots = ids.sortBy(id => ((id * 2654435761L) % 4294967296L, id)).take(nlist)
    val pq = pivots.map(id => vs(id.toInt).map(q8))
    ids.map { id =>
      val v = vs(id.toInt).map(q8)
      val dots = pq.map(p => p.zip(v).map { case (a, b) => a * b }.sum)
      // reduceLeft keeps the FIRST (lowest pivot index) on tied dots
      val best = dots.zipWithIndex.reduceLeft((a, b) => if (b._1 > a._1) b else a)
      id -> best._2.toLong
    }.toMap
  }

  test("property: pivot cell assignment matches the naive argmax oracle") {
    val prop = Prop.forAll(genVecs) { vs =>
      val cells = Similarity.pivotDots(vecDf(vs), nlist = 4)
        .filter(col("pr") === 1).select("id", "p")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      cells == naiveCells(vs, 4)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: pivot-IVF best-found cosine is monotone in nprobe") {
    val prop = Prop.forAll(genVecs) { vs =>
      val df = vecDf(vs)
      def top1(np: Int): Map[Long, Double] =
        Similarity.cosineTopKIvfPivot(df, k = 1, nlist = 4, nprobe = np)
          .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      val lo = top1(1)
      val hi = top1(4)
      // more probes ⇒ candidate superset ⇒ the found neighbor only improves
      lo.forall { case (q, c) => hi.getOrElse(q, Double.MinValue) >= c }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: pivot-IVF at nprobe=nlist equals the exact top-k baseline") {
    val prop = Prop.forAll(genVecs) { vs =>
      val df = vecDf(vs)
      def key(df: DataFrame): Set[(Long, Int, Long, Double)] =
        df.collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      // probing every cell scores every non-self pair exactly once (cells
      // partition the corpus), so the "approximate" result IS the exact one
      key(Similarity.cosineTopKIvfPivot(df, k = 3, nlist = 4, nprobe = 4)) ==
        key(Similarity.cosineTopK(df, df, k = 3, exact = true))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- binary sign sketch (q105) ----

  test("property: reported Hamming = naive sign-bit mismatch count; candidates share a band") {
    val prop = Prop.forAll(genVecs) { vs =>
      // dim=8, 2 bands of 4 bits
      def signBits(v: Array[Float]): Array[Boolean] = v.map(_.toDouble > 0)
      def word(v: Array[Float], b: Int): Long =
        (0 until 4).map(j => if (v(b * 4 + j).toDouble > 0) 1L << j else 0L).sum
      val df = vecDf(vs)
      val out = Similarity.cosineTopKHamming(df, k = 3, dim = 8, nBands = 2,
        shortlistK = 8).collect()
      out.forall { r =>
        val (q, c, h) = (r.getLong(0).toInt, r.getLong(2).toInt, r.getLong(4))
        val naive = signBits(vs(q)).zip(signBits(vs(c))).count(p => p._1 != p._2)
        val shareBand = (0 until 2).exists(b => word(vs(q), b) == word(vs(c), b))
        h == naive && shareBand
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
