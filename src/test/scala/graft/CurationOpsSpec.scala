package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.TextAnalysis
import graft.operators.{Graph, Profile, Sketches}
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{Accepted, TaggedArrival}

/** Round-5 operators: integer PageRank, Bloom-prefiltered semi-join,
  * column profiling, repetition metrics, streaming first-seen dedup. */
class CurationOpsSpec extends AnyFunSuite with SparkSpec {

  // -------------------------------------- cluster canonical / tx evolve

  test("q132: exactly one canonical per cluster; it is a max-quality member") {
    val got = graft.queries.Scale.q132ClusterCanonical(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.nonEmpty)
    val byComp = got.groupBy(_._2)
    byComp.foreach { case (comp, rows) =>
      val canons = rows.filter(_._4)
      assert(canons.length == 1, s"component $comp must keep exactly one member")
      assert(canons.head._1 == canons.head._3) // the keeper IS the canonical
      assert(rows.forall(_._3 == canons.head._1)) // all members agree on it
    }
    // every document appears exactly once
    assert(got.map(_._1).distinct.length == got.length)
  }

  test("q133: evolved store null-fills pre-evolution rows, counts cover the table") {
    val got = graft.queries.Curation.q133TxEvolve(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // the non-cohort rows surface as tier='none' — evolution observable
    assert(got.exists(_._2 == "none"))
    assert(got.map(_._2).toSet.subsetOf(Set("high", "low", "none")))
    val total = got.map(_._3).sum
    val nCustomers = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "customer").count()
    assert(total == nCustomers, "every customer row lands in exactly one group")
  }

  // ------------------------------------------------------------- pagerank

  test("pagerank: hand-computed integer ranks on a 3-node star, 3 iters") {
    import spark.implicits._
    // symmetrized star centered at 1: 1↔2, 1↔3
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Graph.pagerank(edges, iters = 3, d100 = 85)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1: r(1) = 0.15e9 + 0.85·(1e9 + 1e9) = 1850000000
    //        r(leaf) = 0.15e9 + 0.85·(1e9 div 2) = 575000000
    // iter2: r(1) = 0.15e9 + (2·575000000)·85 div 100 = 1127500000
    //        r(leaf) = 0.15e9 + (1850000000 div 2)·85 div 100 = 936250000
    // iter3: r(1) = 0.15e9 + (2·936250000)·85 div 100 = 1741625000
    //        r(leaf) = 0.15e9 + (1127500000 div 2)·85 div 100 = 629187500
    assert(got == Map(1L -> 1741625000L, 2L -> 629187500L, 3L -> 629187500L))
  }

  test("pagerank: zero iterations returns the uniform base; parallel edges collapse") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pagerank(edges, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> Graph.Scale, 2L -> Graph.Scale))
    // duplicated 1→2 must not double 2's inflow: one iteration gives
    // r(2) = 0.15e9 + 0.85·1e9 exactly once
    val one = Graph.pagerank(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(2L) == 150000000L + 850000000L)
  }

  // ----------------------------------------------------------- bloom join

  test("bloomSemiJoin equals the plain semi-join (exact despite the sketch)") {
    import spark.implicits._
    val facts = (1L to 500L).map(i => (i % 97, i)).toDF("k", "payload")
    val dim = Seq(3L, 11L, 96L, 1000L).toDF("dk")
    val got = Sketches.bloomSemiJoin(facts, "k", dim, "dk", mBits = 1024, k = 3)
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = facts.join(dim.select(col("dk").as("k")), Seq("k"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("bloomBitmap is fixed-size; empty dim side yields an empty join") {
    import spark.implicits._
    val keys = (1L to 10000L).toDF("k")
    val bm = Sketches.bloomBitmap(keys, "k", mBits = 4096, k = 3)
    assert(bm.count() <= 4096 / 64)
    val none = Sketches.bloomSemiJoin(
      keys.withColumnRenamed("k", "fk"), "fk",
      spark.emptyDataFrame.select(lit(1L).as("dk")).filter(lit(false)), "dk",
      mBits = 1024, k = 3)
    assert(none.count() == 0)
  }

  // ------------------------------------------------------------ profiling

  test("profile: nulls, distincts, quantized min/max/sum per column") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.25, 10.0), (2.50, 10.0), (null, 30.5), (2.50, null))
      .toDF("a", "b")
    val rows = Profile.profile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    assert(a.getAs[Long]("n_rows") == 4 && a.getAs[Long]("n_null") == 1)
    assert(a.getAs[Long]("n_distinct") == 2) // 125, 250
    assert(a.getAs[Long]("min_q") == 125 && a.getAs[Long]("max_q") == 250)
    assert(a.getAs[Long]("sum_q") == 125 + 250 + 250)
    val b = rows("b")
    assert(b.getAs[Long]("n_null") == 1 && b.getAs[Long]("sum_q") == 1000 + 1000 + 3050)
  }

  // --------------------------------------------------- repetition metrics

  test("repetitionMetrics: duplicated-2-gram char fraction, hand-computed") {
    import spark.implicits._
    val d = Seq((1L, "a b a b c"), (2L, "x")).toDF("doc_id", "text")
    val r2 = TextAnalysis.repetitionMetrics(d, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // grams: "a b"×2, "b a"×1, "b c"×1; chars each = 2 per occurrence
    // dup = 4, total = 8, frac_q = 500000
    assert(r2(1L).getAs[Long]("dup_chars") == 4)
    assert(r2(1L).getAs[Long]("total_chars") == 8)
    assert(r2(1L).getAs[Long]("dup_frac_q") == 500000)
    // doc 2 is shorter than n: zero totals, frac 0 (not a null / not absent)
    assert(r2(2L).getAs[Long]("total_chars") == 0)
    assert(r2(2L).getAs[Long]("dup_frac_q") == 0)
    val r3 = TextAnalysis.repetitionMetrics(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // 3-grams all unique: "a b a","b a b","a b c" → dup 0, total 3·3 = 9
    assert(r3(1L).getAs[Long]("dup_chars") == 0)
    assert(r3(1L).getAs[Long]("total_chars") == 9)
  }

  // --------------------------------------------------------------- ivf-pq

  test("cosineTopKIvfPq: recall@5 vs the exact baseline on real embeddings") {
    import graft.llmops.Similarity
    import graft.sources.Tables
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val exact = Similarity.cosineTopK(e, e, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.cosineTopKIvfPq(e, k = 5, nlist = 8, nprobe = 4,
        m = 8, ksub = 16, rescoreK = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF-PQ recall@5 too low: $recall")
    // every query must still produce a full top-5
    assert(approx.groupBy(_._1).forall(_._2.size == 5))
  }

  test("pivot IVF / IVF-PQ: recall@5 floors vs the exact baseline (declared gate variants)") {
    import graft.llmops.Similarity
    import graft.sources.Tables
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val exact = Similarity.cosineTopK(e, e, k = 5, exact = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    // the hash gates prove the index replicates; these floors prove the
    // index is USEFUL — a quantizer bug that kept determinism but ruined
    // cell quality (e.g. all vectors in one cell's probe shadow) fails here
    val rIvf = recallOf(Similarity.cosineTopKIvfPivot(e, k = 5, nlist = 16, nprobe = 4))
    assert(rIvf >= 0.4, s"pivot-IVF recall@5 too low: $rIvf")
    val rPq = recallOf(Similarity.cosineTopKIvfPqPivot(e, k = 5, nlist = 16,
      nprobe = 4, m = 8, ksub = 16, rescoreK = 32, dim = 64))
    assert(rPq >= 0.3, s"pivot IVF-PQ recall@5 too low: $rPq")
  }

  test("semanticDedup: cosine clusters get min-id labels; outliers are singletons") {
    import spark.implicits._
    import graft.llmops.Similarity
    // 1,2 collinear (cos=1); 3,4 collinear; 5 orthogonal to both
    val e = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(2f, 0f, 0f)),
      (3L, Array(0f, 3f, 0f)), (4L, Array(0f, 1f, 0f)),
      (5L, Array(0f, 0f, 1f))).toDF("id", "vec")
    val out = Similarity.semanticDedup(e, minCosine = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L))
  }

  test("quantiles: interpolation at (n-1)p over exact cents, hand-computed") {
    import spark.implicits._
    // group a: cents {100, 200, 300, 400} → p50 = 250¢, p90 = 100+2.7·100 = 370¢
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 9.99))
      .toDF("k", "value")
    val out = Profile.quantiles(d, "k", "value", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n") == 4)
    assert(out("a").getAs[Double]("p50") == 250.0)
    assert(out("a").getAs[Double]("p90") == 370.0)
    assert(out("b").getAs[Double]("p50") == 999.0) // singleton: every quantile is it
  }

  test("triangles: hand-computed counts incl. degree ties and isolated nodes") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, 3 per node — all degrees tie at 3),
    // pendant edge 4-5, isolated node 6
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("id_a", "id_b")
    val nodes = (1L to 6L).toDF("id")
    val out = Graph.triangles(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L, 6L -> 0L))
  }

  // -------------------------------------------------- stream-stream join

  test("intervalJoin: pairs span micro-batches; lookback bound excludes old refs") {
    import spark.implicits._
    import graft.streaming.StreamJoin
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val clicksIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val errsIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val clicks = clicksIn.toDF().toDF("click_id", "user_id", "click_ts")
    val errs = errsIn.toDF().toDF("err_id", "user_id", "err_ts")
    val qn = "stream_join_spec"
    val q = StreamJoin.intervalJoin(errs, clicks, "user_id",
        "err_ts", "click_ts", lookbackMs = 150000L, delayMs = 600000L)
      .select("err_id", "click_id")
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      // batch 0: clicks only — no output yet, state must hold them
      clicksIn.addData((10L, 1L, ts(100)), (11L, 1L, ts(10)), (12L, 2L, ts(120)))
      q.processAllAvailable()
      // batch 1: errors arrive — click 10 (Δ=100s ≤ 150s) joins, click 11
      // (Δ=190s) is beyond lookback, click 12 is another user
      errsIn.addData((20L, 1L, ts(200)))
      q.processAllAvailable()
      val got = spark.table(qn).as[(Long, Long)].collect().toSet
      assert(got == Set((20L, 10L)))
    } finally q.stop()
  }

  // ------------------------------------------------------ streaming dedup

  test("firstSeen: first batch wins across micro-batches, min id within batch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TaggedArrival]
    val qn = "streaming_dedup_spec"
    val q = StreamingDedup.firstSeen(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      // batch 0: sha X arrives as ids {7, 4}; min wins
      input.addData(TaggedArrival("X", 7L, 0L), TaggedArrival("X", 4L, 0L))
      q.processAllAvailable()
      // batch 1: X again (id 2 — must NOT replace), Y first time (ids 5, 3)
      input.addData(TaggedArrival("X", 2L, 1L),
        TaggedArrival("Y", 5L, 1L), TaggedArrival("Y", 3L, 1L))
      q.processAllAvailable()
      // batch 2: both again — nothing new emitted
      input.addData(TaggedArrival("X", 1L, 2L), TaggedArrival("Y", 1L, 2L))
      q.processAllAvailable()
      val got = spark.table(qn).as[Accepted].collect().toSet
      assert(got == Set(Accepted("X", 4L, 0L), Accepted("Y", 3L, 1L)))
    } finally q.stop()
  }

  test("firstSeenChunks: chunk digests dedup across batches at (id, cidx) granularity") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import StreamingDedup.{ChunkArrival, ChunkAccepted}
    val input = MemoryStream[ChunkArrival]
    val qn = "streaming_chunk_dedup_spec"
    val q = StreamingDedup.firstSeenChunks(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      // batch 0: doc 5 carries gram G twice (cidx 0 and 2) — min cidx wins
      input.addData(ChunkArrival("G", 5L, 2L, 0L), ChunkArrival("G", 5L, 0L, 0L),
        ChunkArrival("H", 5L, 1L, 0L))
      q.processAllAvailable()
      // batch 1: doc 2 re-sends G (lower id, later batch — must NOT win); J is new
      input.addData(ChunkArrival("G", 2L, 0L, 1L), ChunkArrival("J", 2L, 1L, 1L))
      q.processAllAvailable()
      val got = spark.table(qn).as[ChunkAccepted].collect().toSet
      assert(got == Set(ChunkAccepted("G", 5L, 0L, 0L),
        ChunkAccepted("H", 5L, 1L, 0L), ChunkAccepted("J", 2L, 1L, 1L)))
    } finally q.stop()
  }

  test("firstSeenExpiring: TTL drops state on watermark passage; hash re-admits") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val input = MemoryStream[StreamingDedup.TsArrival]
    val qn = "streaming_dedup_ttl_spec"
    val q = StreamingDedup.firstSeenExpiring(input.toDS(), ttlMs = 5000L)
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      // b0: X accepted (expiry = 1000 + 5000 = 6000); watermark after b0 = 1000
      input.addData(StreamingDedup.TsArrival("X", 4L, 0L, ts(1000)))
      q.processAllAvailable()
      // b1: X within TTL → dropped; Y accepted
      input.addData(StreamingDedup.TsArrival("X", 2L, 1L, ts(2000)),
        StreamingDedup.TsArrival("Y", 3L, 1L, ts(2000)))
      q.processAllAvailable()
      // b2: Z pushes the watermark far past X/Y expiry (wm after b2 = 50000)
      input.addData(StreamingDedup.TsArrival("Z", 9L, 2L, ts(50000)))
      q.processAllAvailable()
      // b3: no X/Y data ⇒ their timeouts fire and clear the entries
      input.addData(StreamingDedup.TsArrival("W", 1L, 3L, ts(60000)))
      q.processAllAvailable()
      // b4: X re-arrives AFTER expiry → re-admitted with the new batch
      input.addData(StreamingDedup.TsArrival("X", 8L, 4L, ts(61000)))
      q.processAllAvailable()
      val got = spark.table(qn).as[Accepted].collect().toSet
      assert(got == Set(Accepted("X", 4L, 0L), Accepted("Y", 3L, 1L),
        Accepted("Z", 9L, 2L), Accepted("W", 1L, 3L), Accepted("X", 8L, 4L)))
    } finally q.stop()
  }

  test("admitFirstN: quota counter carries across batches; ranks contiguous") {
    import graft.streaming.StreamingQuota
    import graft.streaming.StreamingQuota.{Admitted, QuotaArrival}
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[QuotaArrival]
    val qn = "streaming_quota_spec"
    val q = StreamingQuota.admitFirstN(input.toDS(), quota = 3)
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      // batch 0: stratum A gets 2 of its 3; B gets 1 (admission sorts by id)
      input.addData(QuotaArrival("A", 7L, 0L), QuotaArrival("A", 4L, 0L),
        QuotaArrival("B", 9L, 0L))
      q.processAllAvailable()
      // batch 1: A has 1 slot left → only the smallest id (2) admitted
      input.addData(QuotaArrival("A", 6L, 1L), QuotaArrival("A", 2L, 1L))
      q.processAllAvailable()
      // batch 2: A is at quota → everything dropped
      input.addData(QuotaArrival("A", 1L, 2L))
      q.processAllAvailable()
      val got = spark.table(qn).as[Admitted].collect().toSet
      assert(got == Set(
        Admitted("A", 4L, 0L, 1L), Admitted("A", 7L, 0L, 2L),
        Admitted("A", 2L, 1L, 3L), Admitted("B", 9L, 0L, 1L)))
    } finally q.stop()
  }

  test("labelPropagation: t rounds flood the minimum exactly t hops, no further") {
    import spark.implicits._
    // path 10-11-12-13-14-15 plus an isolated-from-it pair 20-21
    val edges = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (14L, 15L), (20L, 21L)).toDF("id_a", "id_b")
    def labels(iters: Int): Map[Long, Long] =
      graft.operators.Graph.labelPropagation(edges, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 rounds: node 15 only sees min within 3 hops (12); node 13 reaches 10
    assert(labels(3) == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      14L -> 11L, 15L -> 12L, 20L -> 20L, 21L -> 20L))
    // 5 rounds: the whole path floods to 10; the pair stays its own community
    assert(labels(5) == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      14L -> 10L, 15L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("kcore: peeling removes tails round by round; cliques survive; degrees are within-core") {
    import spark.implicits._
    // 4-clique {1,2,3,4} with a pendant path 4-5-6, plus a triangle {7,8,9}
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (clique ++ Seq((4L, 5L), (5L, 6L),
      (7L, 8L), (8L, 9L), (7L, 9L))).toDF("id_a", "id_b")
    def core(k: Int, rounds: Int): Map[Long, Long] =
      graft.operators.Graph.kcore(edges, k, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=3: the pendant path and the triangle (deg 2 < 3) peel in round 1;
    // the 4-clique survives and node 4's within-core degree is 3 — its
    // pendant edge to the peeled 5 must NOT count in the reported degree
    assert(core(3, 1) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(core(3, 2) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=2: everything but the pendant path survives; round 1 drops only 6
    assert(core(2, 1).keySet == Set(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L))
    assert(core(2, 2).keySet == Set(1L, 2L, 3L, 4L, 7L, 8L, 9L))
    assert(core(2, 2)(4L) == 3L, "4's degree excludes the peeled pendant")
  }

  test("q223 Adamic-Adar: matches an in-memory recomputation at sf0.001") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("cust"))
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
    val ci = o.join(l, "ok").select("cust", "item").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deg = ci.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val w = deg.collect { case (item, d) if d >= 2 && d <= 40 =>
      item -> 1000000000L / math.floor(math.log(d.toDouble) * 1e6 + 0.5).toLong
    }.toMap
    val byItem = ci.filter(p => w.contains(p._2)).groupBy(_._2)
      .view.mapValues(_.map(_._1)).toMap
    val scores = byItem.toSeq.flatMap { case (item, custs) =>
      for (u <- custs if u % 20 == 0; v <- custs if u != v)
        yield (u, v) -> w(item)
    }.groupBy(_._1).view.mapValues(ws => (ws.size.toLong, ws.map(_._2).sum)).toMap
    val want = scores.groupBy(_._1._1).flatMap { case (u, m) =>
      m.toSeq.map { case ((_, v), (n, s)) => (v, n, s) }
        .sortBy { case (v, _, s) => (-s, v) }.take(3).zipWithIndex
        .map { case ((v, n, s), i) => (u, v) -> ((n, s, i + 1L)) }
    }
    val got = graft.queries.Curation.q223AdamicAdar(spark, sf).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Long]("aa_milli"),
          r.getAs[Long]("rk")))).toMap
    assert(got == want, s"got ${got.size} rows, want ${want.size}")
  }

  test("q259 Heaps fit: cumulative type/token series and moment sums equal the hand walk") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.sources.Tables.load(spark, sf, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[String]("text")))
    val want = rows.groupBy(_._1).map { case (src, ds) =>
      val sorted = ds.sortBy(_._2)
      val seen = scala.collection.mutable.Set[String]()
      var cumTok = 0L
      val pts = sorted.flatMap { case (_, _, txt) =>
        val t = "[a-z0-9]+".r.findAllIn(txt.toLowerCase).toSeq
        cumTok += t.length
        t.foreach(seen += _)
        if (cumTok > 0 && seen.nonEmpty)
          Some((math.floor(math.log(cumTok.toDouble) * 1000.0 + 0.5).toLong,
            math.floor(math.log(seen.size.toDouble) * 1000.0 + 0.5).toLong))
        else None
      }
      val n = pts.length.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val m = (BigInt(num) * 1000) /% BigInt(den)
      val slope = (if (m._2 < 0) m._1 - 1 else m._1).toLong
      src -> ((n, num, den, slope))
    }
    val got = graft.queries.Curation.q259HeapsFit(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_points"), r.getAs[Long]("num"),
          r.getAs[Long]("den"), r.getAs[Long]("beta_milli")))).toMap
    assert(got == want)
    // Heaps: vocabulary growth is sublinear on every source
    got.values.foreach { case (_, _, _, beta) => assert(beta < 1000L) }
  }

  test("pagerankPersonalized: hand-walked restart-on-seeds recurrence; zero rank off the seeds' reach") {
    import spark.implicits._
    // star 1<->{2,3}, pair 4<->5 disconnected from the seed
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L),
      (4L, 5L), (5L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.pagerankPersonalized(edges, seeds, iters = 2, d100 = 85)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_q")).toMap
    // hand walk: S=1e9, base=(15/100)·S on seed only
    val S = 1000000000L; val base = S * 15L / 100L
    // r0: 1->S, others 0. out_deg: 1->2, 2->1, 3->1, 4->1, 5->1
    // iter1: in(2)=in(3)=S/2; in(1)=0; r1(1)=base; r1(2)=r1(3)=(S/2)*85/100
    val r12 = S / 2 * 85L / 100L
    // iter2: in(1)=r12/1+r12/1; r2(1)=base+(2*r12)*85/100;
    //        in(2)=in(3)=base/2 → r2(2)=(base/2)*85/100
    assert(got(1L) == base + (2L * r12) * 85L / 100L)
    assert(got(2L) == base / 2L * 85L / 100L && got(2L) == got(3L))
    assert(got(4L) == 0L && got(5L) == 0L, "no restart mass off the seed set")
  }

  test("pagerankDangling: sink mass redistributes uniformly; recurrence matches the driver-side fold") {
    import spark.implicits._
    // 1→2, 1→3, 2→3: node 3 is a SINK — all its rank is dangling mass
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.pagerankDangling(edges, iters = 3, d100 = 85)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_q")).toMap
    // driver-side fold of the exact integer recurrence:
    // r'(v) = base + (in(v) + D div N) * 85 div 100
    val S = 1000000000L; val base = S * 15L / 100L; val n = 3L
    val out = Map(1L -> 2L, 2L -> 1L)
    var r = Map(1L -> S, 2L -> S, 3L -> S)
    (1 to 3).foreach { _ =>
      val in = Map(
        2L -> r(1L) / out(1L),
        3L -> (r(1L) / out(1L) + r(2L) / out(2L)))
      val d = r(3L) // only the sink is dangling
      r = Seq(1L, 2L, 3L).map(v =>
        v -> (base + (in.getOrElse(v, 0L) + d / n) * 85L / 100L)).toMap
    }
    assert(got == r)
    // the sink's inflow dominates, and node 1 (no in-edges) still holds
    // base + redistributed share — strictly more than base alone
    assert(got(3L) > got(2L) && got(2L) > got(1L) && got(1L) > base)
  }

  /** Driver-side replica of the q269/q278 DBSCAN contract over a given
    * ε-graph edge list: degree ≥ 4 core, 6 synchronous min-label rounds
    * over the core-core subgraph, border = min core-neighbor label. */
  private def dbscanWalk(pairs: Array[(Long, Long)],
      allIds: Array[Long]): Map[Long, (String, Long)] = {
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val core = nbrs.collect { case (id, ns) if ns.size >= 4 => id }.toSet
    var labels: Map[Long, Long] = core.map(c => c -> c).toMap
    (1 to 6).foreach { _ =>
      labels = labels.map { case (id, l) =>
        val nl = nbrs(id).filter(core).flatMap(labels.get)
        id -> (nl + l).min
      }
    }
    allIds.map { id =>
      if (core(id)) id -> (("core", labels(id)))
      else {
        val coreNbrLabels = nbrs.getOrElse(id, Set.empty)
          .filter(core).map(labels)
        if (coreNbrLabels.nonEmpty) id -> (("border", coreNbrLabels.min))
        else id -> (("noise", -1L))
      }
    }.toMap
  }

  test("q269 DBSCAN: roles and min-label clusters equal the Scala hand walk of the eps-graph") {
    val sf = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val pairs = graft.llmops.Similarity.cosinePairs(e, minCosine = 0.30)
      .select("id_a", "id_b").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val allIds = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
    val want = dbscanWalk(pairs, allIds)
    val got = graft.queries.Curation.q269Dbscan(spark, sf).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("role"), r.getAs[Long]("cluster")))).toMap
    assert(got == want)
    // (no "label ∈ its cluster" invariant here: with BOUNDED rounds a
    // node's label keeps decreasing while its old label persists farther
    // out — only the exact 6-round replication above is the contract)
    assert(got.values.exists(_._1 == "core") && got.values.exists(_._1 == "noise"))
  }

  test("q278 DBSCAN-LSH: eps-graph ⊆ exact eps-graph; assignment equals the hand walk over it") {
    val sf = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val exact = graft.llmops.Similarity.cosinePairs(e, minCosine = 0.30)
      .select("id_a", "id_b").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val lsh = graft.llmops.Similarity
      .cosinePairsLsh(e, minCosine = 0.30, planes = 16, bands = 4, dim = 64)
      .select("id_a", "id_b").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    // containment: the banded index can only MISS edges, never invent
    // them — so q278's clusters can only split q269's, never merge/extend
    assert(lsh.nonEmpty, "LSH index recalled zero eps-edges")
    lsh.foreach(p => assert(exact.contains(p),
      s"LSH surfaced pair $p absent from the exact eps-graph"))
    val allIds = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
    val want = dbscanWalk(lsh, allIds)
    val got = graft.queries.Curation.q278DbscanLsh(spark, sf).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("role"), r.getAs[Long]("cluster")))).toMap
    assert(got == want)
    assert(got.values.exists(_._1 == "core"), "LSH recall too low to form any core")
  }

  test("bfsDistance: hand-computed hop distances, bounded-round NULL, nearest-seed min") {
    import spark.implicits._
    // path 1-2-3-4-5, pair 6-7, isolated-from-seeds component 8-9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L),
      (8L, 9L)).toDF("id_a", "id_b")
    val seeds = Seq(1L, 6L).toDF("id")
    val out = Graph.bfsDistance(edges, seeds, rounds = 3).collect()
      .map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("dist"))) -1L else r.getAs[Long]("dist")))
      .toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> -1L, // 4 hops > 3 rounds: declared NULL
      6L -> 0L, 7L -> 1L, 8L -> -1L, 9L -> -1L))
    // a 4th round reaches node 5
    val out4 = Graph.bfsDistance(edges, seeds, rounds = 4).collect()
      .map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("dist"))) -1L else r.getAs[Long]("dist")))
      .toMap
    assert(out4(5L) == 4L && out4(8L) == -1L)
  }

  test("ssspWeighted: cheap long route beats expensive direct edge; bounded rounds; parallel-edge min") {
    import spark.implicits._
    // 1-2 (10), 2-3 (1), 1-3 (100): cheapest 1→3 is 11 via 2 edges;
    // a duplicate 1-2 edge at weight 50 must collapse to the min (10);
    // component {8,9} unreachable from the seed
    val edges = Seq((1L, 2L, 10L), (1L, 2L, 50L), (2L, 3L, 1L),
      (1L, 3L, 100L), (8L, 9L, 7L)).toDF("id_a", "id_b", "w")
    val seeds = Seq(1L).toDF("id")
    def run(rounds: Int): Map[Long, Long] =
      Graph.ssspWeighted(edges, seeds, rounds).collect()
        .map(r => r.getAs[Long]("id") ->
          (if (r.isNullAt(r.fieldIndex("cost"))) -1L else r.getAs[Long]("cost")))
        .toMap
    // 1 round: only direct edges relaxed — 3 still costs 100
    assert(run(1) == Map(1L -> 0L, 2L -> 10L, 3L -> 100L, 8L -> -1L, 9L -> -1L))
    // 2 rounds: the 2-edge route through node 2 wins
    assert(run(2) == Map(1L -> 0L, 2L -> 10L, 3L -> 11L, 8L -> -1L, 9L -> -1L))
  }

  test("maximalMatching: handshake pairs the path ends first, then the middle; triangle leaves one node unmatched") {
    import spark.implicits._
    // path 1-2-3-4: round 1 matches (1,2) (both propose it; 3 proposes
    // (2,3), 4 proposes (3,4) -> no handshake), round 2 matches (3,4).
    // triangle {5,6,7}: round 1 matches (5,6); 7 stays unmatched forever.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (5L, 7L),
      (6L, 7L)).toDF("id_a", "id_b")
    val got = Graph.maximalMatching(edges, rounds = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("round")).toMap
    assert(got == Map((1L, 2L) -> 1L, (3L, 4L) -> 2L, (5L, 6L) -> 1L))
    // matching invariant: no node appears twice
    val nodes = got.keys.flatMap { case (a, b) => Seq(a, b) }.toSeq
    assert(nodes.distinct.size == nodes.size, "matched set must be a matching")
  }

  test("hits: hand-computed two-round hubs/authorities with integer renormalization") {
    import spark.implicits._
    // 1->3, 2->3, 2->4: node 2 hubs both authorities, 3 out-ranks 4.
    // round 1: ar(3)=2e6, ar(4)=1e6, am=2e6 -> a=(1e6, 5e5);
    //   hr(1)=1e6, hr(2)=1.5e6 -> h=(666666, 1e6)
    // round 2: ar(3)=1666666, ar(4)=1e6, am=1666666 -> a(3)=1e6,
    //   a(4)=1e12//1666666=600000; hr(1)=1e6, hr(2)=1600000 ->
    //   h(1)=1e12//1600000=625000, h(2)=1e6
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Graph.hits(edges, iters = 2).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("hub_q"), r.getAs[Long]("auth_q")))).toMap
    assert(got == Map(
      1L -> ((625000L, 0L)), 2L -> ((1000000L, 0L)),
      3L -> ((0L, 1000000L)), 4L -> ((0L, 600000L))))
  }

  test("ktruss: K4 survives 4-truss; lone triangle and cascade edges peel") {
    import spark.implicits._
    // K4 on {1,2,3,4}: every edge in 2 triangles -> survives k=4.
    // {5,6,7} triangle: support 1 -> peeled. (1,5)/(2,5): triangle {1,2,5}
    // gives them support 1 -> peeled round 1; round 2 must recompute
    // (1,2)'s support WITHOUT that triangle (the cascade) and still keep
    // K4 (support 2 from {1,2,3} and {1,2,4}).
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L), (5L, 7L), (6L, 7L), (1L, 5L), (2L, 5L))
      .toDF("id_a", "id_b")
    val got = Graph.ktruss(edges, k = 4, rounds = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("support")).toMap
    assert(got == Map((1L, 2L) -> 2L, (1L, 3L) -> 2L, (1L, 4L) -> 2L,
      (2L, 3L) -> 2L, (2L, 4L) -> 2L, (3L, 4L) -> 2L))
    // k=3 keeps every triangle-supported edge incl. {5,6,7}, drops none of
    // K4, and still peels nothing it shouldn't after the cascade
    val g3 = Graph.ktruss(edges, k = 3, rounds = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(g3 == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L), (5L, 7L), (6L, 7L), (1L, 5L), (2L, 5L)))
  }

  test("modularityParts: textbook two-triangles-and-a-bridge; singleton community gets l_in 0") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} bridged by 3-4; isolated pair 8-9 with
    // 9 labeled alone (a singleton community: l_in = 0, contrib < 0)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L), (8L, 9L)).toDF("id_a", "id_b")
    val labels = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 20L, 5L -> 20L,
      6L -> 20L, 8L -> 30L, 9L -> 40L).toDF("id", "label")
    val got = Graph.modularityParts(edges, labels).collect()
      .map(r => r.getAs[Long]("community") ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("l_in"),
          r.getAs[Long]("d_tot"), r.getAs[Long]("contrib_num")))).toMap
    // m = 8: triangle communities: L=3, D=2+2+3=7 -> 4*8*3-49 = 47
    // {8}: L=0, D=1 -> -1; {9}: L=0, D=1 -> -1
    assert(got == Map(
      10L -> ((3L, 3L, 7L, 47L)), 20L -> ((3L, 3L, 7L, 47L)),
      30L -> ((1L, 0L, 1L, -1L)), 40L -> ((1L, 0L, 1L, -1L))))
    // Q * 4m^2 = sum of contribs; perfect-partition sanity: merging the
    // bridge into one community (all six nodes) scores LOWER than the
    // two-triangle split on this graph
    val merged = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 10L, 5L -> 10L,
      6L -> 10L, 8L -> 30L, 9L -> 40L).toDF("id", "label")
    def q(l: DataFrame): Long = Graph.modularityParts(edges, l)
      .agg(sum("contrib_num")).collect().head.getLong(0)
    assert(q(labels) > q(merged), "two triangles must out-score the merge")
  }

  test("clusteringCoeff: hand-computed cc incl. the deg<2 NULL and the K4 clique") {
    import spark.implicits._
    // K4 on {1,2,3,4}: cc = 1 everywhere (3 triangles, deg 3 → 2·3/(3·2));
    // pendant 5 (deg 1 → NULL); triangle {7,8,9} with tail 9-10:
    // cc(7)=cc(8)=1, cc(9)=2·1/(3·2)=333333 ppm; isolated 6 (deg 0 → NULL)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (7L, 8L), (8L, 9L), (7L, 9L), (9L, 10L)).toDF("id_a", "id_b")
    val nodes = (1L to 10L).toDF("id")
    val out = Graph.clusteringCoeff(nodes, edges).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_tri"),
          if (r.isNullAt(r.fieldIndex("cc_ppm"))) -1L else r.getAs[Long]("cc_ppm"))))
      .toMap
    assert(out(1L) == ((3L, 3L, 1000000L)))
    assert(out(4L) == ((4L, 3L, 2L * 3L * 1000000L / (4L * 3L)))) // pendant adds deg
    assert(out(5L) == ((1L, 0L, -1L)))
    assert(out(6L) == ((0L, 0L, -1L)))
    assert(out(7L) == ((2L, 1L, 1000000L)))
    assert(out(9L) == ((3L, 1L, 2L * 1000000L / (3L * 2L))))
    assert(out(10L) == ((1L, 0L, -1L)))
  }

  test("q261 TextRank: the bigram edge frame feeds pagerank exactly (fixture replication at sf0.001)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docsTexts = graft.sources.Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val pairs = docsTexts.flatMap { txt =>
      val t = "[a-z0-9]+".r.findAllIn(txt.toLowerCase).toArray
      t.sliding(2).collect { case Array(a, b) if a != b => (a, b) }
    }
    val edges = (pairs ++ pairs.map(p => (p._2, p._1)))
      .toSeq.toDF("src", "dst")
    val want = graft.operators.Graph.pagerank(edges, iters = 3, d100 = 85)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("rank_q"))
      .sortBy { case (w, q) => (-q, w) }.take(20)
    val got = graft.queries.Curation.q261Textrank(spark, sf).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("rank_q")))
    assert(got.sameElements(want))
  }

  test("q299 Fellegi–Sunter: class rollup equals the brute-forced blocked pairs") {
    val sf = "/root/testdata/sf0.001"
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size").cast("long"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ")(0),
        r.getString(1).split(" ")(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    val want = scala.collection.mutable.Map
      .empty[String, (Long, Long, Long, Long, Long, Long)]
    parts.groupBy(p => (p._4, p._3)).values.foreach { block =>
      for {
        a <- block; b <- block; if a._1 < b._1
      } {
        val adjA = if (a._2 == b._2) 1L else 0L
        val typA = if (a._5 == b._5) 1L else 0L
        val sizA = if (math.abs(a._6 - b._6) <= 2) 1L else 0L
        val priA = if (math.abs(a._7 - b._7) <= 500) 1L else 0L
        val score = (if (adjA == 1) 2565L else -511L) +
          (if (typA == 1) 1609L else -916L) +
          (if (sizA == 1) 1386L else -693L) +
          (if (priA == 1) 1099L else -1204L)
        val cls = if (score >= 3500) "match"
          else if (score >= 0) "possible" else "nonmatch"
        val (n, s, f1, f2, f3, f4) =
          want.getOrElse(cls, (0L, 0L, 0L, 0L, 0L, 0L))
        want(cls) = (n + 1, s + score, f1 + adjA, f2 + typA, f3 + sizA, f4 + priA)
      }
    }
    val got = graft.queries.Curation.q299FellegiSunter(spark, sf).collect()
      .map(r => r.getAs[String]("class") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("sum_score_milli"),
          r.getAs[Long]("n_adj_agree"), r.getAs[Long]("n_type_agree"),
          r.getAs[Long]("n_size_agree"), r.getAs[Long]("n_price_agree")))).toMap
    assert(got == want.toMap)
    assert(got.nonEmpty && got.values.map(_._1).sum > 0, "blocks produce pairs")
  }

  test("q301 MIS: equals the hand-replayed Luby rounds; set is independent in the full graph") {
    val sf = "/root/testdata/sf0.001"
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def h(x: Long): Long = java.lang.Long.parseLong(md5Hex(x.toString).take(12), 16)
    val oi = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // NB: keep the pair tokens a strict List before grouping — grouping the
    // lazy Map.values view undercounts duplicates (188 vs 2324 pairs here)
    val pairTokens = oi.groupBy(_._1).values.toList.flatMap { g =>
      val items = g.map(_._2).sorted
      for (i <- items.indices; j <- i + 1 until items.length)
        yield (items(i), items(j))
    }
    // keySet, NOT .collect{...=> e}: collecting key tuples from a Map
    // rebuilds a Map keyed on id_a and silently collapses the pairs
    val edges0 = pairTokens.groupBy(identity)
      .filter(_._2.size >= 2).keySet
    val nodes0 = edges0.flatMap(e => Seq(e._1, e._2))
    var live = edges0
    var mis = Map.empty[Long, Long]
    var killed = Set.empty[Long]
    for (r <- 1L to 3L) {
      val nbrs = live.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).view.mapValues(_.map(t => h(t._2)).min).toMap
      val winners = nbrs.collect { case (v, mn) if h(v) < mn => v }.toSet
      mis ++= winners.map(_ -> r)
      val dominated = live.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .collect { case (v, u) if winners(v) => u }.toSet
      val killedNow = winners ++ dominated
      killed ++= killedNow
      live = live.filterNot(e => killedNow(e._1) || killedNow(e._2))
    }
    val undecided = live.flatMap(e => Seq(e._1, e._2))
    val isolated = nodes0 -- killed -- undecided
    mis ++= isolated.map(_ -> 4L)
    val got = graft.queries.Curation.q301MaximalIndependentSet(spark, sf)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("round")).toMap
    assert(got == mis)
    assert(got.nonEmpty)
    // independence in the ORIGINAL graph: no edge joins two chosen nodes
    assert(!edges0.exists(e => got.contains(e._1) && got.contains(e._2)),
      "MIS must be pairwise non-adjacent")
  }

  test("q303 greedy coverage: picks, gains, and running total equal the hand-replayed greedy") {
    val sf = "/root/testdata/sf0.001"
    val tokRe = "[a-z0-9]+".r
    val docTokens = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = tokRe.findAllIn(r.getString(1).toLowerCase).toList
        r.getLong(0) -> ws.sliding(2).filter(_.size == 2)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
    var covered = Set.empty[String]
    val want = (1 to 5).iterator.map { r =>
      val (id, gain) = docTokens.view
        .map { case (id, ws) => id -> (ws -- covered).size }
        .minBy { case (id, g) => (-g, id) }
      covered ++= docTokens(id)
      (r.toLong, id, gain.toLong)
    }.takeWhile(_._3 > 0).toVector
    val got = graft.queries.Curation.q303GreedyCoverage(spark, sf).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("id"),
        r.getAs[Long]("gain"), r.getAs[Long]("covered_total")))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == want)
    // running total is the prefix sum of gains = |covered| after each pick
    val prefix = want.scanLeft(0L)(_ + _._3).tail
    assert(got.map(_._4).toSeq == prefix)
    assert(prefix.last == covered.size.toLong,
      "covered_total equals the true covered vocabulary size")
    // gains are non-increasing: greedy on a submodular objective
    assert(want.sliding(2).forall(p => p.head._3 >= p.last._3))
  }
}
