package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Pins for the round-8 analytics operators: skyline2D against brute-force
  * dominance, histogramQuantiles against the exact order statistic's bin. */
class AnalyticsSpec extends AnyFunSuite with SparkSpec {

  private val genPoints: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    pts <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
  } yield pts

  test("property: skyline2D ≡ brute-force Pareto dominance on random points") {
    import spark.implicits._
    val prop = Prop.forAll(genPoints) { pts =>
      val df = pts.zipWithIndex
        .map { case ((u, d), i) => (i.toLong, u, d) }.toDF("id", "up", "down")
      val got = Analytics.skyline2D(df, "id", "up", "down")
        .select("id").collect().map(_.getLong(0)).toSet
      val want = pts.zipWithIndex.collect { case ((u, d), i)
        if !pts.exists { case (u2, d2) =>
          u2 >= u && d2 <= d && (u2 > u || d2 < d) } => i.toLong
      }.toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("skyline2D: duplicate frontier points all survive; dominated dupes all drop") {
    import spark.implicits._
    val df = Seq((1L, 10L, 2L), (2L, 10L, 2L), (3L, 5L, 5L), (4L, 5L, 5L))
      .toDF("id", "up", "down")
    val ids = Analytics.skyline2D(df, "id", "up", "down")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L)) // (5,5) dominated by (10,2); both copies of (10,2) kept
  }

  private val genVals: Gen[List[Long]] = for {
    n <- Gen.choose(1, 60)
    vs <- Gen.listOfN(n, Gen.choose(0L, 500L))
  } yield vs

  test("property: histogramQuantiles picks the exact rank-r order statistic's bin") {
    import spark.implicits._
    val W = 50L
    val prop = Prop.forAll(genVals) { vs =>
      val df = vs.map(("g", _)).toDF("g", "v")
      val out = Analytics.histogramQuantiles(df, "g", "v", W, Seq(50, 95, 99))
        .collect().map(r => (r.getAs[Long]("pct"),
          (r.getAs[Long]("n"), r.getAs[Long]("r"), r.getAs[Long]("bin"),
           r.getAs[Long]("est_q")))).toMap
      val sorted = vs.sorted
      Seq(50L, 95L, 99L).forall { pct =>
        val (n, r, bin, est) = out(pct)
        val exact = sorted((r - 1).toInt) // rank-r order statistic (1-based)
        n == vs.size && r == (vs.size * pct + 99) / 100 &&
          bin == exact / W &&                    // the bin IS the exact one
          est >= bin * W && est <= bin * W + W   // interpolation stays in-bin
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("silhouetteSampled: separated clusters score positive, s bounded by ±1e6") {
    import spark.implicits._
    // two tight, well-separated blobs in 4-d; ids 0/1 seed the k=2 init
    val pts = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)), (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (4L, Array(1.0f, 0.1f, 0.0f, 0.0f)), (6L, Array(0.95f, 0.0f, 0.1f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 1.0f, 0.0f)), (3L, Array(0.0f, 0.1f, 0.9f, 0.0f)),
      (5L, Array(0.1f, 0.0f, 1.0f, 0.0f)), (7L, Array(0.0f, 0.0f, 0.95f, 0.1f)))
    val df = pts.toDF("id", "vec")
    val out = graft.llmops.Similarity
      .silhouetteSampled(df, k = 2, iters = 2, mod = 1L, rem = 0L, maxSampleId = 100L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("s_q")))
    assert(out.length == 8)
    out.foreach { case (id, s) =>
      assert(s > 0L && s <= 1000000L, s"id=$id silhouette s_q=$s should be in (0, 1e6]")
    }
  }

  test("q159 decay: same-total users separate by recency; fresh events undecayed") {
    val out = graft.queries.Scale.q159DecayValue(spark, "/root/testdata/sf0.001")
      .collect()
    out.foreach { r =>
      val (cents, decayed) = (r.getAs[Long]("cents"), r.getAs[Long]("decayed_cents"))
      assert(decayed <= cents && decayed >= 0,
        s"decayed value must be within [0, total] (got $decayed of $cents)")
    }
    // the 30-day testdata span forces real decay somewhere
    assert(out.exists(r => r.getAs[Long]("decayed_cents") < r.getAs[Long]("cents")))
  }

  test("q160 percentile: endpoints hit 0 and 1e6, rank is a total order") {
    val out = graft.queries.LlmOps.q160QualityPercentile(spark, "/root/testdata/sf0.001")
      .collect()
    val pcts = out.map(_.getAs[Long]("pct_q"))
    assert(pcts.min == 0L && pcts.max == 1000000L)
    val ranks = out.map(_.getAs[Long]("rnk")).sorted
    assert(ranks.toSeq == (1L to out.length).toSeq, "ranks must be a 1..n total order")
  }

  test("q161 rolling window ≡ in-memory recompute of every 72h trailing frame") {
    val rows = graft.queries.Scale.q161RollingWindow(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
        r.getAs[Long]("cents"), r.getAs[Long]("roll_n"), r.getAs[Long]("roll_cents")))
    rows.groupBy(_._1).foreach { case (_, evs) =>
      evs.foreach { case (_, ts, _, n, rc) =>
        val frame = evs.filter(e => e._2 >= ts - 259200000000L && e._2 <= ts)
        assert(n == frame.length && rc == frame.map(_._3).sum)
      }
    }
  }

  test("q162 drift: per type, Σ diff over bins telescopes to exactly zero") {
    val rows = graft.queries.Scale.q162ValueDrift(spark, "/root/testdata/sf0.001")
      .collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      assert(rs.map(_.getAs[Long]("diff")).sum == 0L, s"$et: Σ diff must be 0")
      assert(rs.map(_.getAs[Long]("n_early")).sum == rs.head.getAs[Long]("tot_early"))
      assert(rs.map(_.getAs[Long]("n_late")).sum == rs.head.getAs[Long]("tot_late"))
    }
  }

  test("q164 MRR is consistent with q142 recall: hits agree, full recall ⇒ rank 1") {
    val sf = "/root/testdata/sf0.001"
    val mrr = graft.queries.LlmOps.q164AnnMrr(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("first_hit_rank"), r.getAs[Long]("rr_q"))).toMap
    val recall = graft.queries.LlmOps.q142AnnRecall(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("n_hits")).toMap
    assert(mrr.keySet == recall.keySet)
    mrr.foreach { case (id, (rank, rr)) =>
      val hits = recall(id)
      assert((rank > 0) == (hits > 0), s"vec $id: hit presence must agree with recall")
      if (rank > 0) {
        assert(rank >= 1 && rank <= 5 && rr == 1000000L / rank)
      } else assert(rr == 0L)
      if (hits == 5) assert(rank == 1L,
        s"vec $id: all 5 ANN results true ⇒ the first is a hit")
    }
  }

  test("aHashPairs: re-encoded twin lands within Hamming budget; unrelated doc stays out") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps running " * 4
    // transpose two sampled bytes within the LOW word: the pixel sum (hence
    // the mean) is unchanged, only bits 10/20 can flip, and the untouched
    // high word guarantees a band hit — the aHash invariance being pinned
    val twin = base.updated(10, base(20)).updated(20, base(10))
    val other = "zzzz AAAA 0101 completely different rhythm and bytes ~~~ " * 5
    val df = Seq((1L, base), (2L, twin), (3L, other)).toDF("doc_id", "text")
    val pairs = graft.llmops.Multimodal.aHashPairs(df, "doc_id", "text", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming")))
    assert(pairs.exists { case (a, b, _) => a == 1L && b == 2L },
      "the two-char edit must stay within the 6-bit budget")
    assert(pairs.forall { case (a, b, _) => Set(a, b) != Set(1L, 3L) &&
      Set(a, b) != Set(2L, 3L) }, "the unrelated doc must not pair")
  }

  test("q155 correlation pieces assemble a valid r² in [0,1] for every pair") {
    // (the synthetic testdata draws price independently of quantity, so no
    // strength claim — only the Cauchy–Schwarz invariant every valid set of
    // moment pieces must satisfy)
    val rows = graft.queries.Analytics.q155CorrPieces(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 6)
    rows.foreach { p =>
      val (n, sx, sy, sxx, sxy, syy) = (p.getLong(1), p.getLong(2), p.getLong(3),
        p.getLong(4), p.getLong(5), p.getLong(6))
      val num = (n.toDouble * sxy - sx.toDouble * sy)
      val den = (n.toDouble * sxx - sx.toDouble * sx) * (n.toDouble * syy - sy.toDouble * sy)
      val r2 = num * num / den
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12, s"pair ${p.getString(0)}: r²=$r2")
    }
  }

  private val genScored: Gen[List[(Long, Boolean)]] = for {
    n <- Gen.choose(2, 50)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(-5L, 5L), Gen.oneOf(true, false)))
    // need at least one of each class for AUC to be defined
    if rows.exists(_._2) && rows.exists(!_._2)
  } yield rows

  test("property: aucRankSum u2 ≡ brute-force doubled pair count 2#{p>n} + #{p=n}") {
    import spark.implicits._
    val prop = Prop.forAll(genScored) { rows =>
      val df = rows.zipWithIndex
        .map { case ((s, t), i) => (i.toLong, s, t) }.toDF("id", "s", "t")
      val got = Analytics.aucRankSum(df, "s", "id", "t").collect().head
      val pos = rows.collect { case (s, true) => s }
      val neg = rows.collect { case (s, false) => s }
      val u2 = pos.map(p => 2L * neg.count(p > _) + neg.count(p == _)).sum
      got.getAs[Long]("n_pos") == pos.length &&
        got.getAs[Long]("n_neg") == neg.length &&
        got.getAs[Long]("u2") == u2 &&
        got.getAs[Long]("auc_ppm") ==
          u2 * 1000000L / (2L * pos.length * neg.length)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("aucRankSum endpoints: perfect separation → 1e6; inverted → 0; all-tied → half") {
    import spark.implicits._
    val perfect = (1L to 6L).map(i => (i, i, i > 3)).toDF("id", "s", "t")
    assert(Analytics.aucRankSum(perfect, "s", "id", "t")
      .collect().head.getAs[Long]("auc_ppm") == 1000000L)
    val inverted = (1L to 6L).map(i => (i, -i, i > 3)).toDF("id", "s", "t")
    assert(Analytics.aucRankSum(inverted, "s", "id", "t")
      .collect().head.getAs[Long]("auc_ppm") == 0L)
    val tied = (1L to 6L).map(i => (i, 7L, i > 3)).toDF("id", "s", "t")
    assert(Analytics.aucRankSum(tied, "s", "id", "t")
      .collect().head.getAs[Long]("auc_ppm") == 500000L)
  }

  test("aucRankSum one-class input: -1 sentinel, never NULL or a crash") {
    import spark.implicits._
    for (cls <- Seq(true, false)) {
      val oneClass = (1L to 5L).map(i => (i, i, cls)).toDF("id", "s", "t")
      val r = Analytics.aucRankSum(oneClass, "s", "id", "t").collect().head
      assert(!r.isNullAt(r.fieldIndex("auc_ppm")))
      assert(r.getAs[Long]("auc_ppm") == -1L, s"cls=$cls")
    }
  }

  test("q174 kappa: confusion matrix sums to corpus; kappa bounded by ±1e6") {
    val r = graft.queries.Analytics.q174Kappa(spark, "/root/testdata/sf0.001")
      .collect().head
    val n = r.getAs[Long]("n_docs")
    assert(n == spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count())
    val k = r.getAs[Long]("kappa_ppm")
    assert(k >= -1000000L && k <= 1000000L)
  }

  private val genGrouped: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(-100L, 100L)))
  } yield rows

  test("property: madOutliers ≡ in-memory lower-median / MAD / 3σ-fence recompute") {
    import spark.implicits._
    val prop = Prop.forAll(genGrouped) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }.toDF("g", "v", "rid")
      val got = Analytics.madOutliers(df, "g", "v", "rid", k = 3L)
        .collect().map(r => r.getAs[String]("key") ->
          (r.getAs[Long]("n"), r.getAs[Long]("med"), r.getAs[Long]("mad"),
           r.getAs[Long]("n_outliers"))).toMap
      rows.groupBy(_._1).forall { case (g, grp) =>
        // lower median under (value, insertion-id) order = element at
        // rank (n+1)/2 — recompute both order statistics brute-force
        val vs = grp.map(_._2)
        val med = vs.sorted.apply((vs.length + 1) / 2 - 1)
        val devs = vs.map(v => (v - med).abs)
        val mad = devs.sorted.apply((devs.length + 1) / 2 - 1)
        got(g) == ((vs.length.toLong, med, mad,
          devs.count(_ > 3L * mad).toLong))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: ksStat d_num ≡ brute-force max CDF-difference cross term") {
    import spark.implicits._
    val prop = Prop.forAll(genGrouped) { rows =>
      // flag alternates by index so both samples are usually non-empty
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i % 2 == 0) }.toDF("g", "v", "a")
      val got = Analytics.ksStat(df, "g", "v", "a")
        .collect().map(r => r.getAs[String]("key") ->
          (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("d_num"))).toMap
      rows.zipWithIndex.groupBy(_._1._1).forall { case (g, grp) =>
        val as = grp.collect { case ((_, v), i) if i % 2 == 0 => v }
        val bs = grp.collect { case ((_, v), i) if i % 2 != 0 => v }
        val dNum = grp.map(_._1._2).distinct.map { v =>
          (as.count(_ <= v).toLong * bs.length - bs.count(_ <= v).toLong * as.length).abs
        }.max
        got(g) == ((as.length.toLong, bs.length.toLong, dNum))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("charEntropy: uniform text hits exact ln(k); constant text hits 0; empty doc 0") {
    import spark.implicits._
    val df = Seq((1L, "abcd"), (2L, "aaaa"), (3L, "")).toDF("doc_id", "text")
    val out = graft.llmops.TextAnalysis.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("ent_ppm_per_char"))).toMap
    assert(out(1L) == ((4L, math.floor(math.log(4.0) * 1e6 + 0.5).toLong)))
    assert(out(2L) == ((4L, 0L)))
    assert(out(3L) == ((0L, 0L)))
  }

  test("looTargetEncode: encoding excludes own label; singleton category -> -1") {
    import spark.implicits._
    val df = Seq((1L, "x", 1L), (2L, "x", 0L), (3L, "x", 1L), (4L, "solo", 1L))
      .toDF("id", "cat", "y")
    val out = Analytics.looTargetEncode(df, "cat", "id", "y")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("loo_ppm")).toMap
    assert(out(1L) == 500000L)  // peers 0,1 -> 1/2
    assert(out(2L) == 1000000L) // peers 1,1 -> 1
    assert(out(3L) == 500000L)
    assert(out(4L) == -1L)      // no peers
  }

  test("q180 media energy: silence runs and fractions match a hand-built payload") {
    import spark.implicits._
    // 4 frames of 64 chars: loud, silent, silent, loud -> max run 2
    val loud = "z" * 64               // energy 122*64, mean 122
    val quiet = " " * 64              // energy 32*64, mean 32 < 80
    val df = Seq((1L, loud + quiet + quiet + loud), (2L, "")).toDF("doc_id", "text")
    // inline the query body against a temp dir is overkill — drive the same
    // frame/energy pipeline through the declared query on a staged dir
    val tmp = java.nio.file.Files.createTempDirectory("graft-q180").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.queries.LlmOps.q180MediaEnergy(spark, tmp)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_silent"),
         r.getAs[Long]("silent_ppm"), r.getAs[Long]("max_silent_run"))).toMap
    assert(out(1L) == ((4L, 2L, 500000L, 2L)))
    assert(!out.contains(2L), "empty payload must emit zero frames and drop out")
  }

  test("q181 MI cells: marginals re-sum to N and term signs follow dependence direction") {
    val rows = graft.queries.Analytics.q181MutualInfo(spark, "/root/testdata/sf0.001")
      .collect()
    val n = rows.head.getAs[Long]("n")
    assert(rows.map(_.getAs[Long]("n_xy")).sum == n)
    // each cell's term sign must equal the sign of n_xy*N - n_x*n_y
    rows.foreach { r =>
      val lift = r.getAs[Long]("n_xy") * n - r.getAs[Long]("n_x") * r.getAs[Long]("n_y")
      val t = r.getAs[Long]("term_q")
      assert(lift.signum == t.signum || t == 0L,
        s"cell ${r.getAs[String]("event_type")}/${r.getAs[Long]("y")}: lift=$lift term=$t")
    }
  }

  test("q187 nDCG: dcg never exceeds idcg; ratio lands in [0, 1e6]") {
    val r = graft.queries.Pipeline.q187Ndcg(spark, "/root/testdata/sf0.001")
      .collect().head
    val (dcg, idcg, ndcg) = (r.getAs[Long]("dcg_q"), r.getAs[Long]("idcg_q"),
      r.getAs[Long]("ndcg_ppm"))
    assert(dcg <= idcg, s"dcg=$dcg > idcg=$idcg — ideal order must dominate")
    assert(ndcg >= 0L && ndcg <= 1000000L)
  }

  test("q188 per-source AUC: counts re-sum to the corpus; sentinel only for one-class groups") {
    val rows = graft.queries.Analytics.q188AucByGroup(spark, "/root/testdata/sf0.001")
      .collect()
    val total = rows.map(r => r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg")).sum
    assert(total == spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count())
    rows.foreach { r =>
      val (p, n, auc) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
        r.getAs[Long]("auc_ppm"))
      if (p > 0 && n > 0) assert(auc >= 0L && auc <= 1000000L)
      else assert(auc == -1L)
    }
  }

  test("property: prefixSum ≡ in-memory running total under the same total order") {
    import spark.implicits._
    import graft.operators.Ranks
    val prop = Prop.forAll(genGrouped) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
      val got = Ranks.prefixSum(df, "v", "cum", col("g"), col("id"))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum")).toMap
      val want = rows.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
        .sortBy { case (g, i, _) => (g, i) }
        .scanLeft((("", -1L), 0L)) { case ((_, acc), (g, i, v)) => ((g, i), acc + v) }
        .drop(1).map { case ((_, i), acc) => i -> acc }.toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("q189 best threshold: the picked cut's confusion counts are self-consistent") {
    val r = graft.queries.Analytics.q189BestThreshold(spark, "/root/testdata/sf0.001")
      .collect().head
    val (tp, fp, fn, f1) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("f1_ppm"))
    assert(tp >= 0 && fp >= 0 && fn >= 0)
    assert(f1 == (if (tp == 0) 0L else 2 * tp * 1000000L / (2 * tp + fp + fn)))
  }

  test("q196 gains: cumulative capture is monotone and ends at exactly 1e6") {
    val rows = graft.queries.Analytics.q196GainsTable(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getAs[Long]("decile"))
    val gains = rows.map(_.getAs[Long]("gain_ppm"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b }, "gains must be monotone")
    assert(gains.last == 1000000L, "the full corpus captures every positive")
    assert(rows.map(_.getAs[Long]("n_pos")).sum == rows.last.getAs[Long]("cum_pos"))
  }

  test("q195 per-source confusion re-sums to the global q189 sweep at the same cut") {
    val sf = "/root/testdata/sf0.001"
    val global = graft.queries.Analytics.q189BestThreshold(spark, sf).collect().head
    val perSource = graft.queries.Analytics.q195SourceF1(spark, sf).collect()
    assert(perSource.map(_.getAs[Long]("tp")).sum == global.getAs[Long]("tp"))
    assert(perSource.map(_.getAs[Long]("fp")).sum == global.getAs[Long]("fp"))
    assert(perSource.map(_.getAs[Long]("fn")).sum == global.getAs[Long]("fn"))
  }

  test("q197 weighted sample: heavier docs hold higher (closer-to-zero) priorities on a rigged corpus") {
    import spark.implicits._
    // one giant doc among tiny ones: ln(u)/w pushes its priority toward 0,
    // so it must appear in a top-3 cut with near-certainty BY CONSTRUCTION
    // (w = 10000 vs 1): verify the exact ranking math, not a probability
    val tmp = java.nio.file.Files.createTempDirectory("graft-q197").toString
    (Seq((1L, "x" * 10000)) ++ (2L to 40L).map(i => (i, "y")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val top = graft.queries.Analytics.q197WeightedSample(spark, tmp)
      .collect().map(_.getAs[Long]("doc_id")).take(3)
    assert(top.contains(1L), s"the 10000-char doc must rank in the top 3, got ${top.toSeq}")
  }

  test("q173 trend fit: a perfectly linear synthetic series recovers its exact slope") {
    import spark.implicits._
    // y = 7 + 3x over 10 days: slope_micro must be exactly 3e6
    val daily = (0L until 10L).flatMap(x => Seq.fill((7 + 3 * x).toInt)(x))
    val df = daily.map(("a", _)).toDF("event_type", "x")
    val o = df.groupBy("event_type", "x").agg(count(lit(1)).as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum("x").as("s_x"), sum("y").as("s_y"),
        sum(col("x") * col("x")).as("s_xx"),
        sum(col("x") * col("y")).as("s_xy"))
      .withColumn("slope_num", expr("n_days * s_xy - s_x * s_y"))
      .withColumn("slope_den", expr("n_days * s_xx - s_x * s_x"))
      .withColumn("slope_micro", expr(
        """(slope_num * 1000000
          | - ((slope_num * 1000000 % slope_den) + slope_den) % slope_den)
          | div slope_den""".stripMargin))
      .collect().head
    assert(o.getAs[Long]("slope_micro") == 3000000L)
  }

  private val sf001 = "/root/testdata/sf0.001"

  test("q211 Kaplan–Meier: curve equals the hand-folded integer recurrence and never rises") {
    val rows = graft.queries.Analytics.q211KaplanMeier(spark, sf001)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("at_risk"),
        r.getAs[Long]("converted"), r.getAs[Long]("surv_ppm")))
    assert(rows.nonEmpty && rows.map(_._1).sorted.sameElements(rows.map(_._1)))
    var surv = 1000000L
    rows.foreach { case (_, ar, cv, got) =>
      surv = surv * (ar - cv) / ar
      assert(got == surv, s"fold mismatch at at_risk=$ar")
    }
    assert(rows.map(_._4).zip(rows.map(_._4).drop(1)).forall { case (a, b) => b <= a })
  }

  test("q212 autocorrelation: lags match an in-memory BigInt recomputation of the daily series") {
    val daily = spark.read.parquet(s"$sf001/orders.parquet")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .groupBy("day").agg(sum("cents").as("x"))
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("x")))
      .sortBy(_._1).map(_._2).map(BigInt(_))
    val n = BigInt(daily.size)
    val sx = daily.sum
    val dev = daily.map(x => n * x - sx)
    val den = dev.map(d => d * d).sum
    def floorDiv(a: BigInt, b: BigInt): BigInt = {
      val q = a / b; if (a % b != 0 && (a.signum * b.signum) < 0) q - 1 else q
    }
    val want = (1 to 7).map { k =>
      val num = dev.dropRight(k).zip(dev.drop(k)).map { case (a, b) => a * b }.sum
      (k.toLong, (daily.size - k).toLong, floorDiv(num * 1000000, den).toLong)
    }
    val got = graft.queries.Analytics.q212Autocorr(spark, sf001)
      .collect().map(r => (r.getAs[Long]("lag"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("acf_ppm"))).toSeq
    assert(got == want)
  }

  test("q216 CUPED: both arms carry the pooled theta; adjustment composes the quantized pieces") {
    val rows = graft.queries.Analytics.q216Cuped(spark, sf001).collect()
    assert(rows.length == 2)
    val thetas = rows.map(_.getAs[Long]("theta_ppm")).distinct
    assert(thetas.length == 1, "theta is pooled — identical across arms")
    // adjusted means shrink toward each other vs raw when arms differ on X:
    // recompute the adjustment from the emitted integer pieces
    rows.foreach { r =>
      val raw = r.getAs[Long]("mean_y_micro")
      val adj = r.getAs[Long]("adj_mean_y_micro")
      assert(math.abs(adj - raw) <= math.abs(thetas.head) * 100000000L,
        "adjustment bounded by theta times the mean-x spread scale")
    }
  }

  test("q220 SPRT: cumulative LLR is the hand-folded integer combination; verdict thresholds hold") {
    val rows = graft.queries.Analytics.q220Sprt(spark, sf001)
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("n"),
        r.getAs[Long]("s"), r.getAs[Long]("cum_n"), r.getAs[Long]("cum_s"),
        r.getAs[Long]("llr_micro"), r.getAs[String]("verdict")))
    assert(rows.nonEmpty)
    // recompute the two quantized increments from the control arm
    val ev = graft.sources.Tables.load(spark, sf001, "events")
      .select(col("user_id"), col("event_type")).collect()
    val a = ev.filter(_.getLong(0) % 2 == 0)
    val (na, sa) = (a.length.toLong, a.count(_.getString(1) == "purchase").toLong)
    val p0 = sa * 1000000L / na
    val p1 = math.min(p0 * 5 / 4, 999999L)
    val lr1 = math.floor(math.log(p1.toDouble / p0) * 1e6 + 0.5).toLong
    val lr0 = math.floor(math.log((1000000L - p1).toDouble / (1000000L - p0)) * 1e6 + 0.5).toLong
    var (cn, cs) = (0L, 0L)
    rows.foreach { case (_, n, s, gcn, gcs, llr, verdict) =>
      cn += n; cs += s
      assert((gcn, gcs) == (cn, cs))
      assert(llr == cs * lr1 + (cn - cs) * lr0)
      val want = if (llr >= 2944439L) "reject_h0"
        else if (llr <= -2944439L) "accept_h0" else "continue"
      assert(verdict == want)
    }
  }

  test("q222 Holt: level/trend equal the hand-folded coupled integer recurrences") {
    val rows = graft.queries.Analytics.q222Holt(spark, sf001)
      .collect().map(r => (r.getAs[Long]("cents"), r.getAs[Long]("level"),
        r.getAs[Long]("trend"), r.getAs[Long]("forecast")))
    assert(rows.nonEmpty)
    var l = -1L; var b = 0L
    rows.foreach { case (x, gl, gb, gf) =>
      val lNew = if (l < 0) x else (3 * x + 7 * (l + b)) / 10
      val bNew = if (l < 0) 0L else ((lNew - l) + 9 * b) / 10
      assert((gl, gb, gf) == ((lNew, bNew, lNew + bNew)))
      l = lNew; b = bNew
    }
  }

  test("q230 CUSUM: statistics equal the hand-folded reset recurrence; alarms at h=mu") {
    val rows = graft.queries.Analytics.q230Cusum(spark, sf001)
      .collect().map(r => (r.getAs[Long]("cents"), r.getAs[Long]("sp"),
        r.getAs[Long]("sn"), r.getAs[String]("alarm")))
    assert(rows.nonEmpty)
    val xs = rows.map(_._1)
    val mu = xs.sum / xs.length
    val k = mu / 10
    var sp = 0L; var sn = 0L
    rows.foreach { case (x, gsp, gsn, alarm) =>
      sp = math.max(0L, (if (sp > mu) 0L else sp) + x - mu - k)
      sn = math.max(0L, (if (sn > mu) 0L else sn) + mu - x - k)
      assert((gsp, gsn) == ((sp, sn)))
      val want = if (sp > mu && sn > mu) "both"
        else if (sp > mu) "up" else if (sn > mu) "down" else "none"
      assert(alarm == want)
    }
    assert(rows.exists(_._4 != "none"), "constants chosen so alarms fire")
  }

  test("q231 chi-square: contributions equal the BigInt hand-recompute; margins consistent") {
    val rows = graft.queries.Analytics.q231ChiSquare(spark, sf001).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow"),
        r.getAs[Long]("o"), r.getAs[Long]("rt"), r.getAs[Long]("ct"),
        r.getAs[Long]("nt"), r.getAs[Long]("contrib_ppm")))
    assert(rows.nonEmpty)
    val n = rows.map(_._3).sum
    assert(rows.forall(_._6 == n), "nt is the global count")
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.forall(_._4 == g.map(_._3).sum), "row margin = sum of its cells")
    }
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.forall(_._5 == g.map(_._3).sum), "col margin = sum of its cells")
    }
    rows.foreach { case (_, _, o, rt, ct, nt, got) =>
      val diff = BigInt(o) * nt - BigInt(rt) * ct
      val want = (diff * diff * 1000000) / (BigInt(rt) * ct * nt)
      assert(BigInt(got) == want)
    }
  }

  test("q234 Fano: moments and the ppm ratio equal the BigInt hand-recompute") {
    val ev = graft.sources.Tables.load(spark, sf001, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
    val want = ev.groupBy(_._1).map { case (et, rows) =>
      val ns = rows.groupBy(_._2).map(_._2.length.toLong).toSeq
      val (m, s) = (ns.length.toLong, ns.sum)
      val ss = ns.map(n => n * n).sum
      val fano = (BigInt(m) * ss - BigInt(s) * s) * 1000000 / (BigInt(m) * s)
      et -> ((m, s, ss, fano.toLong))
    }
    val got = graft.queries.Analytics.q234FanoFactor(spark, sf001).collect()
      .map(r => r.getAs[String]("event_type") -> ((r.getAs[Long]("m"),
        r.getAs[Long]("s"), r.getAs[Long]("ss"), r.getAs[Long]("fano_ppm")))).toMap
    assert(got == want)
  }

  test("q235 trimmed mean: trim bounds and both means equal the hand sort") {
    val c = graft.sources.Tables.load(spark, sf001, "customer")
      .selectExpr("CAST(c_nationkey AS BIGINT)", "c_custkey",
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = graft.queries.Analytics.q235TrimmedMean(spark, sf001).collect()
      .map(r => r.getAs[Long]("nation") -> ((r.getAs[Long]("n"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("sum_kept"),
        r.getAs[Long]("trimmed_mean_milli"), r.getAs[Long]("mean_milli")))).toMap
    // balances can be negative, and floorDivScaledSql floors (not truncates):
    // recompute with explicit floor division
    val want = c.groupBy(_._1).map { case (nat, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length.toLong
      val cut = (n / 10).toInt
      val kept = sorted.slice(cut, sorted.length - cut)
      def fdiv(a: BigInt, b: BigInt): Long = {
        val q = a * 1000 /% b
        (if (q._2 < 0) q._1 - 1 else q._1).toLong
      }
      nat -> ((n, kept.length.toLong, kept.sum,
        fdiv(kept.sum, kept.length), fdiv(sorted.sum, n)))
    }
    assert(got == want)
  }

  test("q236 Benford: digit shares sum to ~1e6; expectation is the quantized log10 law") {
    val rows = graft.queries.Analytics.q236Benford(spark, sf001).collect()
      .map(r => (r.getAs[Long]("digit"), r.getAs[Long]("cnt"),
        r.getAs[Long]("total"), r.getAs[Long]("obs_ppm"),
        r.getAs[Long]("exp_ppm"), r.getAs[Long]("diff_ppm")))
    assert(rows.map(_._1).toSeq == (1L to 9L), "all nine digits present")
    val total = rows.head._3
    assert(rows.map(_._2).sum == total, "digit counts partition the orders")
    rows.foreach { case (d, cnt, tot, obs, exp, diff) =>
      assert(obs == cnt * 1000000 / tot)
      assert(exp == math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5).toLong)
      assert(diff == obs - exp)
    }
    // Benford's expectations themselves sum to 1e6 (up to rounding)
    assert(math.abs(rows.map(_._5).sum - 1000000L) <= 5)
  }

  test("q238 Kendall tau: pair census equals the O(n^2) hand walk; tau from C-D") {
    val daily = graft.sources.Tables.load(spark, sf001, "orders")
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .groupBy("day").agg(sum("cents").as("x"), count(lit(1)).as("y"))
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L; var txy = 0L; var np = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val ((xa, ya), (xb, yb)) = (daily(i), daily(j))
      np += 1
      val p = BigInt(xa - xb) * BigInt(ya - yb)
      if (xa == xb && ya == yb) txy += 1
      else if (xa == xb) tx += 1
      else if (ya == yb) ty += 1
      else if (p > 0) c += 1 else d += 1
    }
    val row = graft.queries.Analytics.q238KendallTau(spark, sf001).collect().head
    assert((row.getAs[Long]("c"), row.getAs[Long]("d"), row.getAs[Long]("tx"),
      row.getAs[Long]("ty"), row.getAs[Long]("txy"),
      row.getAs[Long]("n_pairs")) == ((c, d, tx, ty, txy, np)))
    val fd = {
      val q = (BigInt(c) - d) * 1000000 /% np
      (if (q._2 < 0) q._1 - 1 else q._1).toLong
    }
    assert(row.getAs[Long]("tau_a_ppm") == fd)
    assert(c + d + tx + ty + txy == np, "census partitions the pairs")
  }

  test("q244 ABC: ranks, cumulative sums, and class cuts equal the hand sort") {
    val rev = graft.sources.Tables.load(spark, sf001, "lineitem")
      .selectExpr("l_partkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS ec")
      .groupBy("l_partkey").agg(sum("ec").as("rev"))
      .collect().map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("rev")))
    val sorted = rev.sortBy { case (p, r) => (-r, p) }
    val total = BigInt(rev.map(_._2).sum)
    var cum = BigInt(0)
    val want = sorted.zipWithIndex.map { case ((p, r), i) =>
      cum += r
      val cls = if (cum * 100 <= total * 80) "A"
        else if (cum * 100 <= total * 95) "B" else "C"
      (i + 1L, p, r, cum.toLong, cls)
    }
    val got = graft.queries.Analytics.q244AbcClasses(spark, sf001).collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("partkey"),
        r.getAs[Long]("rev"), r.getAs[Long]("cum"), r.getAs[String]("abc_class")))
    assert(got.toSeq == want.toSeq)
    // all three classes materialize and partition the parts in rank order
    // (the synthetic revenue is near-uniform, so A ≈ 80% of parts — the
    // classifier is exact regardless of how skewed the distribution is)
    val classes = got.map(_._5)
    assert(Set("A", "B", "C").subsetOf(classes.toSet))
    assert(classes.sameElements(classes.sorted), "classes are monotone in rank")
  }

  test("q219 SES: smoothed series equals the hand-folded alpha=0.3 integer recurrence") {
    val rows = graft.queries.Analytics.q219Ses(spark, sf001)
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("cents"),
        r.getAs[Long]("ses_cents")))
    assert(rows.nonEmpty)
    var prev = -1L
    rows.foreach { case (_, x, got) =>
      val want = if (prev < 0) x else (3 * x + 7 * prev) / 10
      assert(got == want)
      prev = want
    }
  }

  /** Doubled average rank (2·avg-rank) hand walk: for each value, 2·#less
    * + #equal + 1. */
  private def doubledRanks(vs: Seq[Long]): Map[Long, Long] = {
    val sorted = vs.sorted
    vs.distinct.map { v =>
      val less = sorted.count(_ < v).toLong
      val eq = sorted.count(_ == v).toLong
      v -> (2L * less + eq + 1L)
    }.toMap
  }

  test("q251 Spearman: moment sums over doubled average ranks equal the BigInt hand walk") {
    val per = graft.sources.Tables.load(spark, sf001, "orders")
      .selectExpr("o_custkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .groupBy("o_custkey").agg(sum("cents").as("x"), count(lit(1)).as("y"))
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    val ux = doubledRanks(per.map(_._1))
    val uy = doubledRanks(per.map(_._2))
    val n = BigInt(per.length)
    val us = per.map { case (x, y) => (BigInt(ux(x)), BigInt(uy(y))) }
    val (sux, suy) = (us.map(_._1).sum, us.map(_._2).sum)
    val suxx = us.map(u => u._1 * u._1).sum
    val suyy = us.map(u => u._2 * u._2).sum
    val suxy = us.map(u => u._1 * u._2).sum
    val num = n * suxy - sux * suy
    val dx = n * suxx - sux * sux
    val dy = n * suyy - suy * suy
    val rho2 = {
      val inner = (num * num) / dx
      val mag = (inner * 1000000) / dy
      (if (num < 0) -mag else mag).toLong
    }
    val row = graft.queries.Analytics.q251Spearman(spark, sf001).collect().head
    assert(row.getAs[Long]("n") == n.toLong)
    assert(row.getAs[Long]("sux") == sux.toLong)
    assert(row.getAs[Long]("suy") == suy.toLong)
    assert(row.getAs[Long]("num") == num.toLong)
    assert(row.getAs[Long]("dx") == dx.toLong)
    assert(row.getAs[Long]("dy") == dy.toLong)
    assert(row.getAs[Long]("rho2_signed_ppm") == rho2)
    // doubled ranks of n values must sum to n(n+1) (a permutation identity
    // that holds through every tie pattern)
    assert(sux == n * (n + 1) && suy == n * (n + 1))
  }

  test("q252 Mann-Whitney: tie-aware doubled U equals the direct pair census") {
    val c = graft.sources.Tables.load(spark, sf001, "customer")
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .selectExpr("c_mktsegment AS seg",
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getAs[String]("seg"), r.getAs[Long]("v")))
    val a = c.filter(_._1 == "BUILDING").map(_._2)
    val b = c.filter(_._1 == "MACHINERY").map(_._2)
    // direct census: 2·U1 = 2·#(a>b pairs) + #(a=b pairs)
    var u1x2 = 0L
    for (x <- a; y <- b) {
      if (x > y) u1x2 += 2L else if (x == y) u1x2 += 1L
    }
    val row = graft.queries.Analytics.q252MannWhitney(spark, sf001).collect().head
    assert(row.getAs[Long]("n1") == a.length.toLong)
    assert(row.getAs[Long]("n2") == b.length.toLong)
    assert(row.getAs[Long]("u1_x2") == u1x2)
    assert(row.getAs[Long]("u2_x2") == 2L * a.length * b.length - u1x2)
    // rank-sum identity: R1·2 = U1·2 + n1(n1+1)
    assert(row.getAs[Long]("r1_x2") ==
      u1x2 + a.length.toLong * (a.length + 1L))
  }

  test("q256 Holt-Winters: the seasonal recurrence equals the hand walk (m=7, zero-init)") {
    val daily = graft.sources.Tables.load(spark, sf001, "orders")
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .groupBy("day").agg(sum("cents").as("cents"))
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("cents")))
      .sortBy(_._1)
    var l = 0L; var b = 0L
    val sArr = Array.fill(7)(0L)
    val want = daily.zipWithIndex.map { case ((day, x), i) =>
      val idx = i % 7
      val sOld = sArr(idx)
      val lN = if (i == 0) x else (3 * (x - sOld) + 7 * (l + b)) / 10
      val bN = if (i == 0) 0L else ((lN - l) + 9 * b) / 10
      val sN = (2 * (x - lN) + 8 * sOld) / 10
      val fc = lN + bN + sArr((i + 1) % 7)
      sArr(idx) = sN; l = lN; b = bN
      (day, x, lN, bN, sN, fc)
    }
    val got = graft.queries.Analytics.q256HoltWinters(spark, sf001).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("cents"),
        r.getAs[Long]("level"), r.getAs[Long]("trend"),
        r.getAs[Long]("season"), r.getAs[Long]("forecast")))
    assert(got.sameElements(want))
  }

  test("q257 MASE: error accumulators equal the replayed Holt recurrence") {
    val daily = graft.sources.Tables.load(spark, sf001, "orders")
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .groupBy("day").agg(sum("cents").as("cents"))
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("cents")))
      .sortBy(_._1).map(_._2)
    var l = 0L; var b = 0L; var prev = 0L; var se = 0L; var sd = 0L
    daily.zipWithIndex.foreach { case (x, i) =>
      if (i > 0) { se += math.abs(x - (l + b)); sd += math.abs(x - prev) }
      val lN = if (i == 0) x else (3 * x + 7 * (l + b)) / 10
      val bN = if (i == 0) 0L else ((lN - l) + 9 * b) / 10
      l = lN; b = bN; prev = x
    }
    val row = graft.queries.Analytics.q257MaseEval(spark, sf001).collect().head
    assert(row.getAs[Long]("n") == daily.length.toLong)
    assert(row.getAs[Long]("sum_abs_err") == se)
    assert(row.getAs[Long]("sum_abs_naive") == sd)
    assert(row.getAs[Long]("mase_ppm") == (BigInt(se) * 1000000 / BigInt(sd)).toLong)
  }

  test("q258 readability: per-doc Flesch terms equal the Scala regex hand walk") {
    val rows = graft.sources.Tables.load(spark, sf001, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("text")))
    val per = rows.map { case (lang, text) =>
      val w = "\\S+".r.findAllIn(text.trim).length.toLong
      val sents = math.max(1L, "[.!?]".r.findAllIn(text).length.toLong)
      val sy = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
      (lang, w, sents, sy)
    }.filter(_._2 > 0)
    val want = per.groupBy(_._1).map { case (lang, docs) =>
      val fres = docs.map { case (_, w, sents, sy) =>
        20684L - (1015L * w) / (10L * sents) - (8460L * sy) / w }
      val m = BigInt(fres.sum) /% BigInt(fres.length)
      val meanFloor = (if (m._2 < 0) m._1 - 1 else m._1).toLong
      lang -> ((docs.length.toLong, docs.map(_._2).sum, docs.map(_._4).sum,
        meanFloor))
    }
    val got = graft.queries.LlmOps.q258Readability(spark, sf001).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_words"),
          r.getAs[Long]("total_syllables"), r.getAs[Long]("mean_fre_centi"))))
      .toMap
    assert(got == want)
  }

  test("q267 Nelson-Aalen: floored hazard steps and their prefix sum, hand-walked vs q211's table") {
    val km = graft.queries.Analytics.q211KaplanMeier(spark, sf001).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("at_risk"),
        r.getAs[Long]("converted"))).sortBy(_._1)
    var cum = 0L
    val want = km.map { case (k, n, d) =>
      val step = d * 1000000L / n
      cum += step
      (k, n, d, step, cum)
    }
    val got = graft.queries.Analytics.q267NelsonAalen(spark, sf001).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("at_risk"),
        r.getAs[Long]("converted"), r.getAs[Long]("h_step_ppm"),
        r.getAs[Long]("cumhaz_ppm")))
    assert(got.sameElements(want))
    // hazard accumulates while KM survival decays: both monotone
    assert(got.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("q262 isotonic: minimax fit equals sequential PAV and is monotone") {
    val cells = graft.queries.Analytics.q183Calibration(spark, sf001)
      .select("decile", "n", "n_pos").collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n"), r.getAs[Long]("n_pos")))
      .sortBy(_._1)
    // sequential pool-adjacent-violators over floor-ppm pooled rates
    case class Block(n: Long, pos: Long)
    def rate(b: Block): Long = b.pos * 1000000L / b.n
    // merge on EXACT rational comparison (cross-multiplied); floor to ppm
    // only at output — floor commutes with the minimax's min/max, so the
    // floored minimax equals the floored exact PAV fit
    val stack = scala.collection.mutable.Stack[Block]()
    cells.foreach { case (_, n, pos) =>
      var cur = Block(n, pos)
      while (stack.nonEmpty &&
          BigInt(stack.top.pos) * cur.n > BigInt(cur.pos) * stack.top.n) {
        val t = stack.pop(); cur = Block(t.n + cur.n, t.pos + cur.pos)
      }
      stack.push(cur)
    }
    val pav = stack.toList.reverse.flatMap(b => List.fill(b.n.toInt)(rate(b)))
    // expand per-decile: each block covers its member deciles
    val perDecile = {
      val blocks = stack.toList.reverse
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      var i = 0
      blocks.foreach { b =>
        var covered = 0L
        while (covered < b.n) { covered += cells(i)._2; out += rate(b); i += 1 }
        assert(covered == b.n, "blocks align to decile boundaries")
      }
      out.toSeq
    }
    val got = graft.queries.Analytics.q262IsotonicCalibration(spark, sf001)
      .collect().map(r => (r.getAs[Long]("decile"), r.getAs[Long]("fit_ppm")))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == perDecile)
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "isotonic fit must be monotone non-decreasing")
    assert(pav.length == cells.map(_._2).sum.toInt)
  }

  test("q263 average precision: AP equals the O(n log n) hand walk") {
    val scored = graft.llmops.TextAnalysis
      .hashedNgramScore(graft.sources.Tables.load(spark, sf001, "documents"),
        "doc_id", "text")
      .select("id", "score_milli").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("score_milli")))
    val en = graft.sources.Tables.load(spark, sf001, "documents")
      .filter(col("lang") === "en").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val ranked = scored.sortBy { case (id, sc) => (-sc, id) }
    var cum = 0L; var sumP = 0L
    ranked.zipWithIndex.foreach { case ((id, _), k0) =>
      if (en.contains(id)) {
        cum += 1
        sumP += cum * 1000000L / (k0 + 1L)
      }
    }
    val row = graft.queries.Analytics.q263AveragePrecision(spark, sf001)
      .collect().head
    assert(row.getAs[Long]("n_docs") == ranked.length.toLong)
    assert(row.getAs[Long]("n_pos") == cum)
    assert(row.getAs[Long]("sum_p_ppm") == sumP)
    assert(row.getAs[Long]("ap_ppm") == sumP / cum)
  }

  test("q255 Theil-Sen: the median slope is the exact lower-median order statistic") {
    val daily = graft.sources.Tables.load(spark, sf001, "orders")
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .groupBy("day").agg(sum("cents").as("c"))
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("c")))
    val slopes = for {
      i <- daily.indices; j <- daily.indices
      if daily(i)._1 < daily(j)._1
    } yield {
      val q = (BigInt(daily(j)._2 - daily(i)._2) * 1000000) /% BigInt(daily(j)._1 - daily(i)._1)
      (if (q._2 < 0) q._1 - 1 else q._1).toLong
    }
    val sorted = slopes.sorted
    val want = sorted((sorted.length + 1) / 2 - 1)
    val row = graft.queries.Analytics.q255TheilSen(spark, sf001).collect().head
    assert(row.getAs[Long]("n_pairs") == slopes.length.toLong)
    assert(row.getAs[Long]("median_slope_ppm") == want)
  }

  /** Collected (user, id, type, ts_us, cents) event rows in stream order. */
  private def eventRows(): Array[(Long, Long, String, Long, Long)] =
    graft.sources.Tables.load(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._4, t._2))

  test("q300 change-point: the argmax, means, and tie-break equal the BigInt hand-walk") {
    val daily = spark.read.parquet(s"$sf001/orders.parquet")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .groupBy("day").agg(sum("cents").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val sn = daily.map(_._2).sum
    var sk = 0L
    var best: (BigInt, Long, Long, Long) = (BigInt(-1), 0L, 0L, 0L) // (d, -k, day, sk)
    daily.zipWithIndex.foreach { case ((day, cents), i) =>
      sk += cents
      val k = i + 1L
      if (k < n) {
        val d = (BigInt(n) * sk - BigInt(k) * sn).abs
        if (d > best._1 || (d == best._1 && -k > best._2)) best = (d, -k, day, sk)
      }
    }
    val row = graft.queries.Analytics.q300ChangePoint(spark, sf001).collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("k_star") == -best._2)
    assert(row.getAs[Long]("split_day") == best._3)
    assert(BigInt(row.getAs[Long]("d_star")) == best._1)
    val k = -best._2; val skB = best._4
    assert(row.getAs[Long]("mean_before") == skB / k)
    assert(row.getAs[Long]("mean_after") == (sn - skB) / (n - k))
    assert(row.getAs[Long]("shift_cents") ==
      (sn - skB) / (n - k) - skB / k)
  }

  private val shapleyChannels = Seq("click" -> 1L, "error" -> 2L, "signup" -> 4L,
    "view" -> 8L)

  /** Per-purchase trailing-7d channel mask, replayed independently. */
  private def purchaseMasks(): Seq[(Long, Long)] = { // (mask, cents)
    val evs = eventRows()
    val byUser = evs.groupBy(_._1)
    evs.filter(_._3 == "purchase").toSeq.map { case (u, _, _, ts, cents) =>
      val window = byUser(u).filter(e => e._4 >= ts - 604800000000L && e._4 < ts)
      val mask = shapleyChannels.collect {
        case (tpe, bit) if window.exists(_._3 == tpe) => bit
      }.sum
      (mask, cents)
    }
  }

  test("q298 Shapley: equals the 24-permutation brute force; efficiency axiom holds") {
    val conv = purchaseMasks().filter(_._1 > 0)
      .groupBy(_._1).map { case (m, g) =>
        m -> (g.size.toLong, g.map(_._2).sum)
      }
    def v(set: Long): (Long, Long) = conv
      .filter { case (m, _) => (m & set) == m }.values
      .foldLeft((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
    val perms = shapleyChannels.map(_._2).permutations.toSeq // 24 orderings
    val phi = shapleyChannels.map { case (name, bit) =>
      var pn = 0L; var pc = 0L
      perms.foreach { perm =>
        val before = perm.takeWhile(_ != bit).sum
        val (n1, c1) = v(before + bit); val (n0, c0) = v(before)
        pn += n1 - n0; pc += c1 - c0
      }
      name -> ((pn, pc))
    }.toMap
    val got = graft.queries.Analytics.q298Shapley(spark, sf001).collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("phi24_n"), r.getAs[Long]("phi24_cents")))).toMap
    assert(got == phi)
    val (vn, vc) = v(15L)
    assert(got.values.map(_._1).sum == 24L * vn, "efficiency axiom (counts)")
    assert(got.values.map(_._2).sum == 24L * vc, "efficiency axiom (cents)")
  }

  test("q305 peak concurrency: equals the brute-force sweep; earliest peak instant wins") {
    val evs = eventRows()
    val sessions = evs.groupBy(_._1).toList.flatMap { case (u, g) =>
      val ts = g.sortBy(e => (e._4, e._2)).map(_._4)
      ts.foldLeft(Vector.empty[Vector[Long]]) {
        case (acc, t) if acc.nonEmpty && t - acc.last.last <= 43200000000L =>
          acc.init :+ (acc.last :+ t)
        case (acc, t) => acc :+ Vector(t)
      }.map(v => (u, v.head, v.last))
    }
    val bounds = sessions
      .flatMap { case (u, s, e) =>
        Seq((s, 0, 1L, u, s), (e, 1, -1L, u, s)) }
      .sortBy(b => (b._1, b._2, b._4, b._5))
    var c = 0L; var peak = -1L; var peakTs = 0L
    bounds.foreach { b =>
      c += b._3
      if (c > peak) { peak = c; peakTs = b._1 }
    }
    val row = graft.queries.Analytics.q305PeakConcurrency(spark, sf001)
      .collect().head
    assert(row.getAs[Long]("n_sessions") == sessions.size.toLong)
    assert(row.getAs[Long]("peak_concurrency") == peak)
    assert(row.getAs[Long]("peak_at_us") == peakTs)
    assert(peak >= 1L && peak <= evs.map(_._1).distinct.length.toLong,
      "peak concurrency bounded by the user count")
  }

  test("q308 Croston: per-part smoothers equal the hand fold; rate bounded by history") {
    val rows = spark.read.parquet(s"$sf001/lineitem.parquet")
      .filter(pmod(col("l_partkey"), lit(97)) === 0)
      .select(col("l_partkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 604800000000").as("w"),
        expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val weekly = rows.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val w0 = weekly.keys.map(_._2).min
    val want = weekly.keys.map(_._1).toSeq.distinct.sorted.map { part =>
      val series = weekly.collect { case ((p, w), q) if p == part =>
        (w - w0 + 1L, q) }.toSeq.sortBy(_._1)
      var n = 0L; var z = 0L; var p = 0L; var prev = 0L
      series.foreach { case (widx, q) =>
        if (n == 0L) { n = 1L; z = q; p = widx * 100L; prev = widx }
        else {
          n += 1L
          z = (2L * q + 8L * z) / 10L
          p = (2L * (widx - prev) * 100L + 8L * p) / 10L
          prev = widx
        }
      }
      (part, n, z, p, z * 1000000L / p)
    }
    val got = graft.queries.Analytics.q308Croston(spark, sf001).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Long]("n_demand_weeks"),
        r.getAs[Long]("z_hat_centi"), r.getAs[Long]("p_hat_centiweeks"),
        r.getAs[Long]("rate_ppm"))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall(_._4 >= 100L),
      "smoothed interval never drops below one week")
  }

  test("q309 Poisson bootstrap: replicate means equal the hand grid; CI brackets the point mean") {
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val ts = Seq(103548857136060L, 207097714272121L, 258872142840152L,
      276130285696162L, 280444821410164L, 281307728552965L)
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val means = (0L until 64L).map { b =>
      var num = 0L; var den = 0L
      orders.foreach { case (id, cents) =>
        val h = java.lang.Long.parseLong(md5Hex(s"${id}_$b").take(12), 16)
        val m = ts.count(_ <= h).toLong
        num += m * cents; den += m
      }
      num / den
    }.sorted
    val row = graft.queries.Analytics.q309BootstrapCi(spark, sf001)
      .collect().head
    assert(row.getAs[Long]("n_orders") == orders.length.toLong)
    assert(row.getAs[Long]("mean_cents") ==
      orders.map(_._2).sum / orders.length)
    assert(row.getAs[Long]("boot_p05") == means(3))
    assert(row.getAs[Long]("boot_p50") == means(31))
    assert(row.getAs[Long]("boot_p95") == means(60))
    assert(row.getAs[Long]("boot_p05") <= row.getAs[Long]("mean_cents") &&
      row.getAs[Long]("mean_cents") <= row.getAs[Long]("boot_p95"),
      "the bootstrap interval brackets the point estimate at this SF")
  }

  test("q297 Markov attribution: equals the hand-replayed chain solve; removal never helps") {
    val evs = eventRows()
    // transitions, replayed independently of the query's window machinery
    val trans0 = scala.collection.mutable.Map.empty[(String, String), Long]
    def bump(f: String, t: String): Unit =
      trans0((f, t)) = trans0.getOrElse((f, t), 0L) + 1L
    evs.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(e => (e._4, e._2))
      var j = 0L
      var prev: Option[(String, Long)] = None
      sorted.zipWithIndex.foreach { case ((_, _, tpe, _, _), i) =>
        val from = prev match {
          case Some((pt, pj)) if pj == j => pt
          case _ => "start"
        }
        if (tpe == "purchase") bump(from, "conv") else bump(from, tpe)
        if (i == sorted.length - 1 && tpe != "purchase") bump(tpe, "null")
        prev = Some((tpe, j))
        if (tpe == "purchase") j += 1
      }
    }
    val SCALE = BigInt(1000000000000L)
    def solve(removed: Option[String]): Map[String, BigInt] = {
      val tr = trans0.toSeq
        .filter { case ((f, _), _) => !removed.contains(f) }
        .map { case ((f, t), c) =>
          (f, if (removed.contains(t)) "null" else t, c) }
        .groupBy(x => (x._1, x._2))
        .map { case ((f, t), g) => (f, t, g.map(_._3).sum) }.toSeq
      val tot = tr.groupBy(_._1).map { case (f, g) => f -> g.map(_._3).sum }
      var p = tot.keys.map(_ -> BigInt(0)).toMap
      for (_ <- 1 to 15) {
        p = tot.map { case (f, den) =>
          val num = tr.filter(_._1 == f).map { case (_, t, c) =>
            BigInt(c) * (t match {
              case "conv" => SCALE
              case "null" => BigInt(0)
              case s => p.getOrElse(s, BigInt(0))
            })
          }.sum
          f -> num / BigInt(den)
        }
      }
      p
    }
    val pBase = solve(None)("start")
    val convCents = evs.filter(_._3 == "purchase").map(_._5).sum
    val chans = Seq("click", "error", "signup", "view")
    val rem = chans.map { c =>
      val pRem = solve(Some(c)).getOrElse("start", BigInt(0))
      assert(pRem <= pBase, s"removing $c must not raise conversion")
      c -> (pRem, BigInt(1000000) - pRem * 1000000 / pBase)
    }
    val sumRe = rem.map(_._2._2).sum
    val got = graft.queries.Analytics.q297MarkovAttribution(spark, sf001)
      .collect().map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("p_base_ppm"), r.getAs[Long]("p_removed_ppm"),
          r.getAs[Long]("removal_ppm"), r.getAs[Long]("credited_cents")))).toMap
    rem.foreach { case (c, (pRem, re)) =>
      val (gBase, gRem, gRe, gCred) = got(c)
      assert(BigInt(gBase) == pBase / 1000000)
      assert(BigInt(gRem) == pRem / 1000000)
      assert(BigInt(gRe) == re)
      assert(BigInt(gCred) == BigInt(convCents) * re / sumRe)
    }
  }

  // --------------------------------------- round-12 stats tier hand walks

  test("q322 Hill: top-k tail terms equal the hand census; estimator invariant to boundary tie choice") {
    val texts = graft.sources.Tables.load(spark, sf001, "documents")
      .select("text").collect().map(_.getString(0))
    val grams = texts.flatMap { t =>
      val w = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toArray
      (0 until math.max(0, w.length - 2)).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
    }
    val counts = grams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assume(counts.size > 101, "corpus too small for k=100")
    // only the COUNT multiset enters the estimate, so the hand walk needs
    // no tie-break on gram identity: take the 101 largest counts
    val topCounts = counts.values.toSeq.sorted(Ordering[Long].reverse).take(101)
    val ck1 = topCounts(100)
    val sumLn = topCounts.take(100)
      .map(c => math.floor(math.log(c.toDouble / ck1.toDouble) * 1000000.0 + 0.5).toLong)
      .sum
    val alpha =
      if (sumLn == 0) None
      else Some(Math.floorDiv(100L * 1000000L * 1000000L, sumLn))
    val row = graft.queries.Analytics.q322HillTail(spark, sf001).collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getAs[Long]("k") == 100L)
    assert(r.getAs[Long]("x_k1") == ck1, "x_(k+1) order statistic")
    assert(r.getAs[Long]("sum_ln_ppm") == sumLn, "quantized tail sum")
    assert(Option(r.getAs[java.lang.Long]("alpha_ppm")).map(_.toLong) == alpha)
    // a Pareto tail index must be positive and finite here
    alpha.foreach(a => assert(a > 0))
  }

  test("q321 SNIPS: cell-collapsed estimate equals the BigInt hand walk; support audit exact") {
    val rows = graft.sources.Tables.load(spark, sf001, "events")
      .selectExpr("pmod(user_id, 4) AS seg", "event_type AS act",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS r")
      .collect().map(r => (r.getAs[Long]("seg"), r.getAs[String]("act"), r.getAs[Long]("r")))
    val cells = rows.groupBy(t => (t._1, t._2)).view
      .mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
    val segN = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val acts = Seq("click", "error", "purchase", "signup", "view")
    val policies = Map(
      "uniform" -> acts.map(_ -> 200L).toMap,
      "always_purchase" -> Map("purchase" -> 1000L))
    val got = graft.queries.Analytics.q321SnipsEval(spark, sf001).collect()
      .map(r => r.getAs[String]("policy") ->
        ((r.getAs[Long]("n_cells"), r.getAs[Long]("snips_ccents"),
          r.getAs[Long]("n_unsupported")))).toMap
    assert(got.keySet == policies.keySet)
    policies.foreach { case (p, pi) =>
      val seen = cells.keys.filter(k => pi.contains(k._2)).toSeq
      val num = seen.map { case k @ (seg, act) =>
        val (nc, sr) = cells(k)
        BigInt(pi(act)) * segN(seg) * sr / nc // nonneg: / == floor div
      }.sum
      val den = seen.map { case (seg, act) => BigInt(pi(act)) * segN(seg) }.sum
      val wantSnips = (num * 100 / den).toLong
      val wantUnsup = segN.keys.flatMap(s => pi.keys.map(a => (s, a)))
        .count(k => !cells.contains(k)).toLong
      val (gn, gs, gu) = got(p)
      assert(gn == seen.length.toLong, s"$p n_cells")
      assert(gs == wantSnips, s"$p snips: got $gs want $wantSnips")
      assert(gu == wantUnsup, s"$p unsupported")
    }
    // self-normalization keeps the estimate in the reward range — a lost
    // Σw denominator would blow it past the max logged reward
    val maxR = rows.map(_._3).max
    got.values.foreach { case (_, snips, _) =>
      assert(snips >= 0 && snips <= maxR * 100, s"SNIPS left the reward range: $snips") }
  }

  test("q310 Welch: t and df equal the IEEE hand walk from exact integer moments") {
    val per = graft.sources.Tables.load(spark, sf001, "orders")
      .selectExpr("o_orderpriority AS prio",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100 AS v")
      .collect().map(r => (r.getAs[String]("prio"), r.getAs[Long]("v")))
    val groups = per.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val tn = per.length.toLong
    val ts = per.map(_._2).sum
    val tss = per.map(v => v._2 * v._2).sum
    val got = graft.queries.Analytics.q310WelchTtest(spark, sf001).collect()
      .map(r => r.getAs[String]("prio") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_dollars"),
          r.getAs[Long]("t_ppm"), r.getAs[Long]("df_ppm")))).toMap
    assert(got.keySet == groups.keySet)
    groups.foreach { case (prio, vs) =>
      val n = vs.length.toLong; val s = vs.sum; val ss = vs.map(v => v * v).sum
      val (n2, s2, ss2) = (tn - n, ts - s, tss - ss)
      // the exact double sequence both engines evaluate
      val m1 = s.toDouble / n.toDouble
      val m2 = s2.toDouble / n2.toDouble
      val se1 = ((ss.toDouble - (s.toDouble * s.toDouble) / n.toDouble) / (n.toDouble - 1.0)) / n.toDouble
      val se2 = ((ss2.toDouble - (s2.toDouble * s2.toDouble) / n2.toDouble) / (n2.toDouble - 1.0)) / n2.toDouble
      val tppm = math.floor((m1 - m2) / math.sqrt(se1 + se2) * 1000000.0 + 0.5).toLong
      val dfppm = math.floor((se1 + se2) * (se1 + se2) /
        (se1 * se1 / (n.toDouble - 1.0) + se2 * se2 / (n2.toDouble - 1.0)) * 1000000.0 + 0.5).toLong
      val (gn, gs, gt, gdf) = got(prio)
      assert(gn == n && gs == s, s"$prio moments")
      assert(gt == tppm, s"$prio t: got $gt want $tppm")
      assert(gdf == dfppm, s"$prio df: got $gdf want $dfppm")
      // Welch df is bounded by min(n1,n2)-1 ≤ df ≤ n1+n2-2
      assert(gdf >= (math.min(n, n2) - 1) * 1000000L - 1 && gdf <= (n + n2 - 2) * 1000000L)
    }
  }

  private def tokensOf(text: String): Array[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toArray

  test("q311 Good-Turing: N_r, r*, and P0 equal the trigram hand census") {
    val texts = graft.sources.Tables.load(spark, sf001, "documents")
      .select("text").collect().map(_.getString(0))
    val grams = texts.flatMap { t =>
      val w = tokensOf(t)
      (0 until math.max(0, w.length - 2)).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
    }
    val fof = grams.groupBy(identity).view.mapValues(_.length.toLong).values
      .groupBy(identity).view.mapValues(_.size.toLong).toMap // r -> N_r
    val totalTokens = fof.map { case (r, nr) => r * nr }.sum
    val n1 = fof.getOrElse(1L, 0L)
    val got = graft.queries.Analytics.q311GoodTuring(spark, sf001).collect()
    assert(got.map(_.getAs[Long]("r")).toSet == fof.keySet.filter(_ <= 10))
    got.foreach { row =>
      val r = row.getAs[Long]("r")
      assert(row.getAs[Long]("n_r") == fof(r), s"N_$r")
      val nNext = fof.getOrElse(r + 1, 0L)
      assert(row.getAs[Long]("n_r_next") == nNext)
      assert(row.getAs[Long]("r_star_ppm") == (r + 1) * nNext * 1000000L / fof(r))
      assert(row.getAs[Long]("total_tokens") == totalTokens)
      assert(row.getAs[Long]("n1") == n1)
      assert(row.getAs[Long]("p0_ppm") == n1 * 1000000L / totalTokens)
    }
  }

  test("q312 trimmed/winsorized means equal the sorted-vector hand walk") {
    val ev = graft.sources.Tables.load(spark, sf001, "events")
      .selectExpr("event_type AS et",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getAs[String]("et"), r.getAs[Long]("v")))
    val got = graft.queries.Analytics.q312TrimmedMeans(spark, sf001).collect()
      .map(r => r.getAs[String]("et") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("k"), r.getAs[Long]("lo_cents"),
          r.getAs[Long]("hi_cents"), r.getAs[Long]("trimmed_mean_cc"),
          r.getAs[Long]("winsor_mean_cc")))).toMap
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val vs = rows.map(_._2).sorted
      val n = vs.length.toLong; val k = (n / 10).toInt
      val lo = vs(k); val hi = vs(vs.length - 1 - k)
      val trimmed = vs.slice(k, vs.length - k)
      val wins = vs.indices.map(i =>
        if (i < k) lo else if (i >= vs.length - k) hi else vs(i))
      def fdiv(num: BigInt, den: BigInt): Long =
        ((num * 100 - (((num * 100) % den) + den) % den) / den).toLong
      val (gn, gk, glo, ghi, gtm, gwm) = got(et)
      assert(gn == n && gk == k.toLong && glo == lo && ghi == hi, s"$et bounds")
      assert(gtm == fdiv(BigInt(trimmed.map(BigInt(_)).sum.toLong), BigInt(trimmed.length)), s"$et trimmed")
      assert(gwm == fdiv(BigInt(wins.map(BigInt(_)).sum.toLong), BigInt(n)), s"$et winsor")
    }
  }

  test("q313 PMI: top-20 equals the bigram hand census under the same double sequence") {
    val texts = graft.sources.Tables.load(spark, sf001, "documents")
      .select("text").collect().map(_.getString(0))
    val toks = texts.map(tokensOf)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val big = toks.flatMap(w => (0 until math.max(0, w.length - 1))
        .map(i => (w(i), w(i + 1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTok = uni.values.sum; val nBig = big.values.sum
    val want = big.toSeq.filter(_._2 >= 5).map { case ((x, y), cxy) =>
      val pmi = math.floor(math.log(cxy.toDouble * nTok.toDouble / nBig.toDouble *
        nTok.toDouble / (uni(x).toDouble * uni(y).toDouble)) * 1000000.0 + 0.5).toLong
      (x, y, cxy, uni(x), uni(y), pmi)
    }.sortBy(t => (-t._6, t._1, t._2)).take(20)
    val got = graft.queries.Analytics.q313PmiCollocations(spark, sf001).collect()
      .map(r => (r.getAs[String]("x"), r.getAs[String]("y"), r.getAs[Long]("c_xy"),
        r.getAs[Long]("c_x"), r.getAs[Long]("c_y"), r.getAs[Long]("pmi_q")))
    assert(got.toSeq == want, s"got ${got.take(3).toSeq} want ${want.take(3)}")
  }

  test("q315 vocab growth: deciles, cumulatives, and first-seen types equal the hand census") {
    val dr = graft.sources.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val mx = dr.map(_._1).max
    def decile(id: Long): Long = id * 10 / (mx + 1)
    val grams = dr.flatMap { case (id, t) =>
      val w = tokensOf(t)
      (0 until math.max(0, w.length - 2))
        .map(i => (decile(id), s"${w(i)} ${w(i + 1)} ${w(i + 2)}"))
    }
    val docsPerD = dr.groupBy(x => decile(x._1)).view.mapValues(_.length.toLong).toMap
    val toksPerD = grams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val firstSeen = grams.groupBy(_._2).view.mapValues(_.map(_._1).min).values
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.queries.Analytics.q315VocabGrowth(spark, sf001).collect()
    assert(got.map(_.getAs[Long]("decile")).toSeq == docsPerD.keys.toSeq.sorted)
    got.foreach { r =>
      val d = r.getAs[Long]("decile")
      val upTo = (0L to d).filter(docsPerD.contains)
      assert(r.getAs[Long]("n_docs_decile") == docsPerD(d))
      assert(r.getAs[Long]("cum_docs") == upTo.map(docsPerD).sum)
      assert(r.getAs[Long]("cum_tokens") == upTo.map(toksPerD.getOrElse(_, 0L)).sum)
      assert(r.getAs[Long]("cum_vocab") == upTo.map(firstSeen.getOrElse(_, 0L)).sum)
    }
    // growth must be monotone and saturating: each decile adds fewer new
    // types per new gram than the corpus-wide average of the prefix before
    val vocab = got.map(_.getAs[Long]("cum_vocab"))
    assert(vocab.sameElements(vocab.sorted), "cum_vocab must be monotone")
  }

  test("q316 burstiness: gaps, moments, and B equal the IEEE hand walk") {
    val ev = graft.sources.Tables.load(spark, sf001, "events")
      .selectExpr("user_id", "event_type", "event_id", "unix_micros(ts) AS ts_us")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("event_id"), r.getAs[Long]("ts_us")))
    val gaps = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(e => (e._4, e._3))
      sorted.sliding(2).collect { case Array(a, b) =>
        (a._2, Math.floorDiv(b._4 - a._4, 1000L))
      }
    }
    val got = graft.queries.Analytics.q316Burstiness(spark, sf001).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("sg"),
          r.getAs[Long]("mean_ms"), r.getAs[Long]("b_ppm")))).toMap
    gaps.groupBy(_._1).foreach { case (et, gs) =>
      val v = gs.map(_._2)
      val n = v.length.toLong
      val sg = v.sum
      val sgg = v.map(x => BigInt(x) * BigInt(x)).sum
      val m = sg.toDouble / n.toDouble
      val s = math.sqrt((sgg.toDouble - (sg.toDouble * sg.toDouble) / n.toDouble) / n.toDouble)
      val bppm = math.floor((s - m) / (s + m) * 1000000.0 + 0.5).toLong
      val (gn, gsg, gm, gb) = got(et)
      assert(gn == n && gsg == sg, s"$et moments")
      assert(gm == Math.floorDiv(sg, n), s"$et mean")
      assert(gb == bppm, s"$et B: got $gb want $bppm")
      assert(gb > -1000000L && gb < 1000000L, s"$et B must be in (-1, 1)")
    }
  }

  test("q314 McNemar: census matches q174's confusion matrix; statistic is the integer rational") {
    val k = graft.queries.Analytics.q174Kappa(spark, sf001).collect().head
    val m = graft.queries.Analytics.q314Mcnemar(spark, sf001).collect().head
    val (n10, n01) = (m.getAs[Long]("n10"), m.getAs[Long]("n01"))
    // the two queries build the SAME rater pair — their disagreement cells
    // must agree exactly, and agreements must complete the corpus
    assert(n10 == k.getAs[Long]("n10") && n01 == k.getAs[Long]("n01"))
    assert(m.getAs[Long]("n_agree") == k.getAs[Long]("n11") + k.getAs[Long]("n00"))
    assert(m.getAs[Long]("n_disc") == n10 + n01)
    val cc = math.max(math.abs(n10 - n01) - 1L, 0L)
    assert(m.getAs[Long]("chi2_ppm") == cc * cc * 1000000L / (n10 + n01))
  }
}
