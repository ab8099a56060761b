package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColumnName, DataRequest}
import graft.policy.ShelfLife
import graft.registry.FreshnessManager
import graft.streaming.{StreamingFreshen, ViewStore}

class StreamingSpec extends AnyFunSuite with SparkSpec {

  private class MemoryViewStore(init: DataFrame) extends ViewStore {
    private var cur = init
    override def get(): DataFrame = cur
    override def put(view: DataFrame): Unit = { cur = view.persist(); cur.count() }
  }

  private def emptyView: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Seq[(Long, Double)])].toDF("entity_id", "events_value")
      .withColumn("events_value",
        expr("transform(events_value, v -> named_struct('ts', v._1, 'value', v._2))"))
  }

  private def freshener(store: ViewStore): StreamingFreshen = {
    val mgr = new FreshnessManager(_ => Some(emptyView.schema))
    mgr.storePolicy("events", ColumnName("events:value"),
      classOf[graft.score.EventValueIncrement].getName, new ShelfLife(500L))
    new StreamingFreshen(mgr, "events", store, "events_value",
      DataRequest(Seq(ColumnName("events:value"))))
  }

  private def state(store: ViewStore): Map[Long, (Long, Double)] =
    store.get().select(col("entity_id"),
        expr("events_value[0].ts"), expr("events_value[0].value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("micro-batch freshen: event-time clock, merge, score, late entities caught up") {
    import spark.implicits._
    val store = new MemoryViewStore(emptyView)
    val f = freshener(store)

    // batch 1: e1@1000 is already past the 500ms shelf at asOf=2000 → scored
    f.processBatch(Seq((1L, 1000L, 5.0), (2L, 2000L, 7.0)).toDF("entity_id", "ts", "value"))
    assert(state(store) == Map(1L -> (2000L, 6.0), 2L -> (2000L, 7.0)))

    // batch 2 advances the clock to 5000: e1 (newest 2000) stale again → 7.0;
    // e2 got a fresh event → untouched
    f.processBatch(Seq((2L, 5000L, 9.0)).toDF("entity_id", "ts", "value"))
    assert(state(store) == Map(1L -> (5000L, 7.0), 2L -> (5000L, 9.0)))
  }

  test("newestView: mapGroupsWithState keeps the newest version across batches, out-of-order safe") {
    import spark.implicits._
    import graft.streaming.StreamingFreshen.{newestView, EventRow}
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val out = newestView(mem.toDS())
    val q = out.writeStream.outputMode("update").format("memory").queryName("newest_t").start()
    mem.addData(EventRow(1L, 100L, 5.0), EventRow(1L, 200L, 7.0), EventRow(2L, 50L, 1.0))
    q.processAllAvailable()
    mem.addData(EventRow(1L, 150L, 9.0)) // late, older than current newest
    q.processAllAvailable()
    val last = spark.table("newest_t")
      .groupBy("entity_id").agg(expr("max_by(struct(ts, value), struct(ts, value)) AS n"))
      .selectExpr("entity_id", "n.ts", "n.value")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(last(1L) == (200L, 7.0)) // late event did NOT regress the view
    assert(last(2L) == (50L, 1.0))
    q.stop()
  }

  test("expiryFreshen: event-time timer re-scores entities whose shelf life lapsed") {
    import spark.implicits._
    import graft.streaming.StreamingFreshen.{expiryFreshen, TimedEvent}
    implicit val sq = spark.sqlContext
    def ev(id: Long, ms: Long, v: Double) = TimedEvent(id, new java.sql.Timestamp(ms), v)
    val mem = MemoryStream[TimedEvent]
    val out = expiryFreshen(
      mem.toDS().withWatermark("eventTime", "0 seconds").as[TimedEvent],
      shelfLifeMs = 500L, score = (_, v) => v + 1.0)
    val q = out.writeStream.outputMode("append").format("memory").queryName("expiry_t").start()
    // e1@1000 goes stale at 1500; e2@10000 pushes the watermark past it
    mem.addData(ev(1L, 1000L, 5.0), ev(2L, 10000L, 7.0))
    q.processAllAvailable()
    // any further trigger fires e1's lapsed timer: auto-refresh at ts=1500
    mem.addData(ev(3L, 20000L, 1.0))
    q.processAllAvailable()
    val rows = spark.table("expiry_t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.contains((1L, 1500L, 6.0, true)),
      s"expected auto-refresh of e1 at its expiry deadline; got ${rows.toSeq}")
    // the refreshed version was written back to state stamped at the
    // deadline (not at the watermark), deterministically
    assert(rows.count(_._1 == 1L) >= 2) // original + refresh
    q.stop()
  }

  test("text-file KV store loads tab-separated pairs (TestKVStores analogue)") {
    val f = java.nio.file.Files.createTempFile("graft-cats", ".txt")
    java.nio.file.Files.writeString(f, "felix\tFelis catus\ngarfield\tFelis lasagna\n\n")
    val kv = graft.sources.Stores.textFile(spark, f.toString)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv == Map("felix" -> "Felis catus", "garfield" -> "Felis lasagna"))
    intercept[IllegalArgumentException](graft.sources.Stores.loader(spark)("bogus:x"))
  }

  test("CSV and JSON-lines KV stores load via the format-prefixed loader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stores")
    val csv = dir.resolve("cats.csv")
    java.nio.file.Files.writeString(csv, "key,value,extra\nfelix,Felis catus,x\ngarfield,Felis lasagna,y\n")
    val csvKv = graft.sources.Stores.loader(spark)(s"csv:$csv")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(csvKv == Map("felix" -> "Felis catus", "garfield" -> "Felis lasagna"))
    val jsonl = dir.resolve("cats.jsonl")
    java.nio.file.Files.writeString(jsonl,
      """{"key":"felix","value":"Felis catus"}""" + "\n" +
      """{"key":"garfield","value":"Felis lasagna"}""" + "\n")
    val jsonKv = graft.sources.Stores.loader(spark)(s"json:$jsonl")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(jsonKv == csvKv)
    // malformed JSON line → eager failure, not silent null scores
    val bad = dir.resolve("bad.jsonl")
    java.nio.file.Files.writeString(bad, "{\"key\":\"a\",\"value\":\"b\"}\nnot json\n")
    intercept[IllegalArgumentException](graft.sources.Stores.jsonFile(spark, bad.toString))
    // CSV without the contract columns → eager failure
    val badCsv = dir.resolve("bad.csv")
    java.nio.file.Files.writeString(badCsv, "k,v\na,b\n")
    intercept[IllegalArgumentException](graft.sources.Stores.csvFile(spark, badCsv.toString))
  }

  test("streaming plumbing: foreachBatch over a MemoryStream drives the same engine") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val store = new MemoryViewStore(emptyView)
    val f = freshener(store)
    val mem = MemoryStream[(Long, Long, Double)]
    val events = mem.toDF.toDF("entity_id", "ts", "value")
    mem.addData((1L, 1000L, 5.0), (2L, 2000L, 7.0))
    val ckpt = graft.streaming.StreamConf.ckptDir("graft-ckpt")
    val q = f.start(events, ckpt)
    q.awaitTermination(60000)
    assert(state(store) == Map(1L -> (2000L, 6.0), 2L -> (2000L, 7.0)))
  }

  test("stream-static decontamination ≡ batch decontaminate across multi-batch arrival") {
    import graft.llmops.Corpus
    import graft.streaming.StreamDecontam
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val corpusRows = Seq(
      (1L, "a b c d e shared gram tail one two"),
      (2L, "totally different words with no overlap at all here"),
      (3L, "c d e shared gram tail one two three"),
      (4L, "short doc"))
    val evalRows = Seq((10L, "x c d e shared gram tail one two y"))
    val corpus = corpusRows.toDF("doc_id", "text")
    val eval = evalRows.toDF("doc_id", "text")
    val batch = Corpus.decontaminate(corpus, eval, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // stream the corpus in two micro-batches against the static gram index
    val evalGrams = eval
      .select(explode(StreamDecontam.gramDigests(col("text"), 8)).as("h")).distinct()
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("id", "text")
    mem.addData(corpusRows.take(2).map(r => (r._1, r._2)): _*)
    val out = StreamDecontam.sharedGrams(stream, evalGrams, n = 8)
    val qn = "sdecon_spec"
    val ckpt = graft.streaming.StreamConf.ckptDir("graft-sdecon-spec")
    val q = out.writeStream.outputMode("complete").format("memory")
      .queryName(qn).option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    mem.addData(corpusRows.drop(2).map(r => (r._1, r._2)): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table(qn).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"stream $streamed != batch $batch")
    // sanity: the shared 8-gram run is detected, the clean docs are absent
    assert(batch.keySet == Set(1L, 3L) && batch.values.forall(_ >= 1L))
  }

  test("streaming ANN probe ≡ batch LSH best-match across multi-batch arrival") {
    import graft.streaming.StreamAnn
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = 8
    // index vectors 1-4 (deterministic), queries: 100 = exact copy of 1
    // (cosine 1.0 in its bucket), 101 = near 3, 102 = isolated direction
    def v(seed: Int): Array[Float] =
      Array.tabulate(dim)(j => ((seed * 13 + j * 5) % 9 - 4) / 3.0f)
    val index = Seq(1L, 2L, 3L, 4L).map(i => (i, v(i.toInt))).toDF("id", "vec")
    val queries = Seq((100L, v(1)), (101L, v(3).map(x => x * 0.9f)), (102L, v(7)))
    val mem = MemoryStream[(Long, Array[Float])]
    val stream = mem.toDF.toDF("id", "vec")
    val out = StreamAnn.bestMatch(stream, index, planes = 6, dim = dim)
    val qn = "sann_spec"
    val ckpt = graft.streaming.StreamConf.ckptDir("graft-sann-spec")
    mem.addData(queries.take(1): _*)
    val q = out.writeStream.outputMode("complete").format("memory")
      .queryName(qn).option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    mem.addData(queries.drop(1): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(qn).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // batch reference: same join + best computed on a static frame
    val batchRef = StreamAnn.bestMatch(queries.toDF("id", "vec"), index,
        planes = 6, dim = dim)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == batchRef, s"stream $got != batch $batchRef")
    // the exact copy must find its original at cosine 1.0
    assert(got.contains(100L) && got(100L) == ((1L, 1.0)))
  }

  test("streaming funnel ≡ batch funnel on random streams split at random times") {
    import spark.implicits._
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.FunnelEvent
    implicit val sq = spark.sqlContext
    val types = Seq("view", "click", "purchase", "error")
    val steps = Seq("view", "click", "purchase")
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      val evs = Seq.fill(40)((rnd.nextInt(4) + 1L,
        rnd.nextInt(60) + 1L, types(rnd.nextInt(types.length))))
      val cut = rnd.nextInt(60) + 1L // time split preserves per-entity ts order
      val mem = MemoryStream[FunnelEvent]
      val out = StreamingFunnel.funnel(mem.toDS(), steps, maxSpanUs = 30L)
      val qn = s"funnel_prop_$round"
      val q = out.writeStream.outputMode("append").format("memory").queryName(qn).start()
      def feed(es: Seq[(Long, Long, String)]): Unit =
        if (es.nonEmpty) {
          mem.addData(es.map(e => FunnelEvent(e._1, e._2, e._3, flush = false)))
          q.processAllAvailable()
        }
      feed(evs.filter(_._2 < cut))
      feed(evs.filter(_._2 >= cut))
      mem.addData(evs.map(_._1).distinct.map(u =>
        FunnelEvent(u, 9999L, "flush", flush = true)))
      q.processAllAvailable()
      val streamed = spark.table(qn).collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2), r.getBoolean(3)))).toMap
      val batch = graft.operators.Temporal.funnel(
        evs.toDF("user", "us", "etype")
          .select(col("user"), timestamp_micros(col("us")).as("ts"), col("etype")),
        "user", "ts", "etype", steps, maxSpanUs = 30L)
        .collect().map(r => r.getLong(0) ->
          (((1 to 3).flatMap(i => if (r.isNullAt(i)) None else Some(r.getLong(i))),
            r.getLong(4), r.getBoolean(5)))).toMap
      assert(streamed == batch, s"round $round mismatch (cut=$cut)")
      q.stop()
    }
  }

  test("streaming SCD2 ≡ batch scd2 on random streams split at random times") {
    import spark.implicits._
    import graft.streaming.StreamingScd2
    import graft.streaming.StreamingScd2.Scd2Event
    implicit val sq = spark.sqlContext
    val attrs = Seq("a", "b", "c")
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      // unique (entity, ts) so a time cut preserves per-entity (ts, eid) order
      val evs = rnd.shuffle((1 to 40).toList).zipWithIndex.map { case (t, i) =>
        (rnd.nextInt(3) + 1L, t.toLong, i.toLong, attrs(rnd.nextInt(attrs.length)))
      }
      val cut = rnd.nextInt(40) + 1L
      val mem = MemoryStream[Scd2Event]
      val out = StreamingScd2.scd2(mem.toDS())
      val qn = s"scd2_prop_$round"
      val q = out.writeStream.outputMode("append").format("memory").queryName(qn).start()
      def feed(es: Seq[(Long, Long, Long, String)]): Unit =
        if (es.nonEmpty) {
          mem.addData(es.map(e => Scd2Event(e._1, e._2, e._3, e._4, flush = false)))
          q.processAllAvailable()
        }
      feed(evs.filter(_._2 < cut))
      feed(evs.filter(_._2 >= cut))
      mem.addData(evs.map(_._1).distinct.map(u =>
        Scd2Event(u, 99999L, -1L, "flush", flush = true)))
      q.processAllAvailable()
      val streamed = spark.table(qn).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3),
            if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))).toMap
      val batch = graft.operators.Temporal.scd2(
        evs.toDF("user", "us", "eid", "etype")
          .select(col("user"), timestamp_micros(col("us")).as("ts"),
            col("eid"), col("etype")),
        "user", "ts", "eid", "etype")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3),
            if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))).toMap
      assert(streamed == batch, s"round $round mismatch (cut=$cut)")
      q.stop()
    }
  }

  test("streaming SCD2: closed intervals emit immediately, open one on flush only") {
    import spark.implicits._
    import graft.streaming.StreamingScd2
    import graft.streaming.StreamingScd2.Scd2Event
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Scd2Event]
    val q = StreamingScd2.scd2(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("scd2_t").start()
    // batch 1: run of "a" opens — nothing emits
    mem.addData(Scd2Event(1L, 100L, 1L, "a", flush = false),
      Scd2Event(1L, 200L, 2L, "a", flush = false))
    q.processAllAvailable()
    assert(spark.table("scd2_t").count() == 0)
    // batch 2: change to "b" ACROSS the batch boundary — "a" interval closes NOW
    mem.addData(Scd2Event(1L, 300L, 3L, "b", flush = false))
    q.processAllAvailable()
    val closed = spark.table("scd2_t").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(closed.toSeq == Seq((1L, "a", 100L, 300L, 2L)))
    // batch 3: flush emits the open "b" interval with NULL valid_to
    mem.addData(Scd2Event(1L, 99999L, -1L, "flush", flush = true))
    q.processAllAvailable()
    val all = spark.table("scd2_t").collect()
      .map(r => (r.getLong(1), r.getString(2), r.isNullAt(4))).toSet
    assert(all == Set((1L, "a", false), (2L, "b", true)))
    q.stop()
  }

  test("streaming funnel: partial matches cross batches, flush emits once") {
    import spark.implicits._
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.FunnelEvent
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val out = StreamingFunnel.funnel(mem.toDS(),
      Seq("view", "click", "purchase"), maxSpanUs = 1000L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("funnel_t").start()
    // batch 1: user 1 matches view+click; user 2 sees purchase first (no match)
    mem.addData(FunnelEvent(1L, 100L, "view", flush = false),
      FunnelEvent(1L, 200L, "click", flush = false),
      FunnelEvent(2L, 100L, "purchase", flush = false))
    q.processAllAvailable()
    assert(spark.table("funnel_t").count() == 0) // nothing emitted before flush
    // batch 2: user 1 completes ACROSS the batch boundary; user 2 starts
    mem.addData(FunnelEvent(1L, 300L, "purchase", flush = false),
      FunnelEvent(2L, 200L, "view", flush = false))
    q.processAllAvailable()
    // batch 3: flush both
    mem.addData(FunnelEvent(1L, 99999L, "flush", flush = true),
      FunnelEvent(2L, 99999L, "flush", flush = true))
    q.processAllAvailable()
    val got = spark.table("funnel_t")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got == Map(1L -> ((3L, true)), 2L -> ((1L, false))))
    assert(spark.table("funnel_t").count() == 2) // exactly one row per entity
    q.stop()
  }

  test("streaming MV maintenance (q157): maintained store ≡ batch aggregation") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q157_stream_mv")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val want = graft.sources.Tables.load(spark, sf, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("value_cents"))
      .orderBy("user_id", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("streaming topK: arrival-order independent, k-truncated, ties broken by id") {
    import spark.implicits._
    import graft.streaming.StreamingTopK
    import graft.streaming.StreamingTopK.{Scored, TopEntry}
    implicit val sq = spark.sqlContext
    val items = Seq(
      Scored("a", 1L, 10L, flush = false), Scored("a", 2L, 30L, flush = false),
      Scored("a", 3L, 20L, flush = false), Scored("a", 4L, 30L, flush = false),
      Scored("b", 5L, 7L, flush = false))
    def run(name: String, batches: Seq[Seq[Scored]]): Map[(String, Int), (Long, Long)] = {
      val mem = MemoryStream[Scored]
      val q = StreamingTopK.topK(mem.toDS(), k = 3)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(Scored("a", 0L, 0L, flush = true), Scored("b", 0L, 0L, flush = true))
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[TopEntry].collect()
        .map(e => (e.key, e.rank) -> (e.id, e.score)).toMap
    }
    // score 30 ties between ids 2 and 4 -> id ASC wins rank 1; k=3 drops id 1
    val expect = Map(
      ("a", 1) -> (2L, 30L), ("a", 2) -> (4L, 30L), ("a", 3) -> (3L, 20L),
      ("b", 1) -> (5L, 7L))
    assert(run("topk_fwd", Seq(items.take(2), items.drop(2))) == expect)
    assert(run("topk_rev", Seq(items.reverse.take(3), items.reverse.drop(3))) == expect)
    assert(run("topk_one", Seq(items)) == expect)
  }

  test("streaming rate alerts: mid-window batch split accumulates; spike judged on trailing mean") {
    import spark.implicits._
    import graft.streaming.StreamingRate
    import graft.streaming.StreamingRate.{RateAlert, RateEvent}
    implicit val sq = spark.sqlContext
    // windows 1..4 for key a: counts 10, 10, 50 (spike: 50*2 > 2*20), 10
    // (no spike: 10*3 < 2*70); window 3's count arrives split 30+20 across
    // two batches — the open-window accumulation path
    val b1 = Seq(RateEvent("a", 1L, 10L, flush = false),
      RateEvent("a", 2L, 10L, flush = false),
      RateEvent("a", 3L, 30L, flush = false))
    val b2 = Seq(RateEvent("a", 3L, 20L, flush = false),
      RateEvent("a", 4L, 10L, flush = false))
    def run(name: String, batches: Seq[Seq[RateEvent]]): Seq[(Long, Long, Long, Long, Boolean)] = {
      val mem = MemoryStream[RateEvent]
      val q = StreamingRate.alerts(mem.toDS())
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(RateEvent("a", Long.MaxValue, 0L, flush = true))
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[RateAlert].collect().sortBy(_.win)
        .map(a => (a.win, a.n_events, a.prior_windows, a.prior_total, a.is_spike)).toSeq
    }
    val expect = Seq(
      (1L, 10L, 0L, 0L, false),  // first window: no history, never a spike
      (2L, 10L, 1L, 10L, false),
      (3L, 50L, 2L, 20L, true),  // 50·2 = 100 > 2·20
      (4L, 10L, 3L, 70L, false)) // 10·3 = 30 < 2·70
    assert(run("rate_split", Seq(b1, b2)) == expect)
    assert(run("rate_one", Seq(b1 ++ b2)) == expect)
  }

  test("streaming rate alerts: contract violations fail loudly, not corrupt") {
    import spark.implicits._
    import graft.streaming.StreamingRate
    import graft.streaming.StreamingRate.RateEvent
    implicit val sq = spark.sqlContext
    def expectFailure(name: String, batches: Seq[Seq[RateEvent]], msgPart: String): Unit = {
      val mem = MemoryStream[RateEvent]
      val q = StreamingRate.alerts(mem.toDS())
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      val ex = intercept[Exception] {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      }
      q.stop()
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains(msgPart)),
        s"expected '$msgPart' in failure chain, got: ${msgs(ex).mkString(" | ")}")
    }
    // a window id OLDER than the open one (in-order delivery violated)
    expectFailure("rate_ooo",
      Seq(Seq(RateEvent("a", 5L, 10L, flush = false)),
        Seq(RateEvent("a", 3L, 10L, flush = false))),
      "out-of-order window")
    // a flush sentinel carrying a nonzero count (its n would be lost)
    expectFailure("rate_badflush",
      Seq(Seq(RateEvent("a", 1L, 10L, flush = false),
        RateEvent("a", 2L, 7L, flush = true))),
      "flush sentinel")
    // an older window arriving AFTER a close reset the open id to -1: the
    // open-window check alone would let it silently reopen — lastClosed
    // must catch it across batches
    expectFailure("rate_reopen",
      Seq(Seq(RateEvent("a", 5L, 10L, flush = false),
        RateEvent("a", Long.MaxValue, 0L, flush = true)),
        Seq(RateEvent("a", 3L, 10L, flush = false))),
      "after closed win=5")
    // a flush aimed BELOW the open window is a replay bug, not a request
    // to close whatever happens to be open
    expectFailure("rate_staleflush",
      Seq(Seq(RateEvent("a", 5L, 10L, flush = false)),
        Seq(RateEvent("a", 3L, 0L, flush = true))),
      "targets win=3 below open win=5")
  }

  test("streaming substring admission: hand-computed coverage, verdicts, and batch-split invariance") {
    import spark.implicits._
    import graft.streaming.StreamSubstr
    implicit val sq = spark.sqlContext
    // a 45-char block X present in the static corpus; arriving docs embed
    // it with unique neighbors so covered spans are exactly |X| = 45
    val x = "THEQUICKBROWNFOXJUMPSOVERTHELAZYDOGSAGAIN0123" // 45 chars
    assert(x.length == 45)
    val static = Seq((100L, s"zz$x zz tail of the static corpus document")).toDF("id", "text")
    val statIdx = StreamSubstr.gramIndex(static, "text", L = 40).persist()
    statIdx.count()
    val arrivals = Seq(
      (1L, s"aa${x}bb"),                                  // 45/49 dup -> reject
      (2L, "totally novel content with no dup at all 1"), // clean -> admit
      (3L, s"ee$x"))                                      // 45/47 dup -> reject
    def run(name: String, batches: Seq[Seq[(Long, String)]]): Map[Long, (Long, Long, Long, Boolean)] = {
      val mem = MemoryStream[(Long, String)]
      val q = StreamSubstr.admission(
          mem.toDS().toDF("id", "text"), statIdx, L = 40, permilleMax = 200L)
        .writeStream.outputMode("complete").format("memory").queryName(name).start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    }
    val expect = Map(
      1L -> ((49L, 1L, 45L, false)),
      2L -> ((42L, 0L, 0L, true)),
      3L -> ((47L, 1L, 45L, false)))
    assert(run("ssub_split", arrivals.map(Seq(_))) == expect)
    assert(run("ssub_one", Seq(arrivals)) == expect)
    statIdx.unpersist()
  }

  test("windowed admission (q210): verdict emits once at watermark; late doc dropped; open windows never emit") {
    import spark.implicits._
    import graft.streaming.StreamSubstr
    implicit val sq = spark.sqlContext
    val x = "THEQUICKBROWNFOXJUMPSOVERTHELAZYDOGSAGAIN0123" // 45 chars
    val static = Seq((100L, s"zz$x zz tail of the static corpus document")).toDF("id", "text")
    val statIdx = StreamSubstr.gramIndex(static, "text", L = 40).persist()
    statIdx.count()
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = mem.toDS().toDF("id", "text", "ts").withWatermark("ts", "2 days")
    val q = StreamSubstr.admissionWindowed(stream, statIdx, L = 40, permilleMax = 200L)
      .writeStream.outputMode("append").format("memory").queryName("ssub_wm").start()
    // b1: doc1 (day 1, 45/49 dup) + doc2 (day 10, clean) — the day-10
    // arrival advances the watermark to day 8, past doc1's window end
    mem.addData((1L, s"aa${x}bb", ts(1)),
      (2L, "totally novel content with no dup at all 1", ts(10)))
    q.processAllAvailable()
    // b2: doc3 arrives at day 1 — LATE (window end day 2 < wm day 8):
    // dropped wholesale, never judged; doc4 (day 11) opens a new window
    mem.addData((3L, s"ee$x", ts(1)),
      (4L, "other novel content with no dup anywhere 2", ts(11)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssub_wm").collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // exactly ONE verdict: doc1's, emitted when its window closed. doc3
    // dropped by the watermark; doc2/doc4 windows still open at stop
    assert(got == Map(1L -> ((49L, 1L, 45L, false))),
      s"append-mode admission verdicts wrong: $got")
    statIdx.unpersist()
  }

  test("q281 left-outer interval join: match emits immediately; NULL only after watermark proof; unproven rows never emit") {
    import spark.implicits._
    import graft.streaming.StreamJoin
    implicit val sq = spark.sqlContext
    def day(n: Int): java.sql.Timestamp = new java.sql.Timestamp(n * 86400000L)
    val errMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val clkMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val errors = errMem.toDS().toDF("err_id", "user_id", "err_ts")
    val clicks = clkMem.toDS().toDF("click_id", "user_id", "click_ts")
    val joined = StreamJoin.intervalJoinLeftOuter(errors, clicks, "user_id",
      "err_ts", "click_ts", lookbackMs = 2L * 86400000L, delayMs = 86400000L)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("soj_wm").start()
    // b1: user 1 error+click (in-window match), user 2 error (no click
    // ever), user 3 error at day 20 (too new to prove), day-21 rows on
    // BOTH sides drive the global watermark to day 20 at b2
    errMem.addData((10L, 1L, day(5)), (20L, 2L, day(5)), (30L, 3L, day(20)),
      (99L, 99L, day(21)))
    clkMem.addData((11L, 1L, day(4)), (98L, 98L, day(21)))
    q.processAllAvailable()
    // b2: any row triggers the batch that applies b1's watermark — user
    // 2's error (day 5 < wm day 20) is EVICTED and emits NULL-extended;
    // user 3's (day 20, not < wm) and the day-21 rows stay unproven
    clkMem.addData((97L, 97L, day(21)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("soj_wm")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(1)))).toMap
    assert(got == Map(10L -> ((Some(11L), 1L)), 20L -> ((None, 2L))),
      s"outer-join emissions wrong: $got")
  }

  test("q190 append-mode watermark: stragglers dropped, unfinished windows never emit") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Extended.q190StreamLate(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_events")).toMap
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("unix_micros(ts)").as("us"))
    val wmf = ev.agg(max("us")).collect().head.getLong(0) - 172800000000L
    val expect = ev
      .filter(!(col("day") <= 19727 && pmod(col("event_id"), lit(7)) === 0))
      .filter((col("day") + 1) * 86400000000L <= wmf)
      .groupBy(expr("date_format(timestamp_micros(day * 86400000000), 'yyyy-MM-dd')").as("d"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(out == expect, "emitted counts must equal batch minus stragglers, cut at the final watermark")
    // and the straggler drop is real: raw day-1..5 counts are strictly larger
    val raw = ev.filter(col("day") <= 19727).count()
    val emitted15 = out.collect { case ((d, _), n) if d <= "2024-01-05" => n }.sum
    assert(emitted15 < raw, "stragglers must be missing from the emitted counts")
  }

  test("q284 session_window: gap boundary is end-exclusive; emitted sessions equal batch islands cut at the watermark") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // boundary pin: events exactly `gap` apart DO merge (Spark's session
    // extension is end-inclusive on merge — probed here), one µs over
    // splits — batch-mode session_window shares the streaming merge
    // semantics
    val gapUs = 7200000000L
    val b = Seq((1L, 0L), (1L, gapUs + 1), (2L, 0L), (2L, gapUs))
      .toDF("user_id", "us").select(col("user_id"),
        expr("timestamp_micros(us)").as("ts"))
      .groupBy(session_window(col("ts"), "2 hours"), col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n"))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(b == Map(1L -> Seq(1L, 1L), 2L -> Seq(2L)),
      "diff == gap+1µs must split; diff == gap must merge")
    // end-to-end: emitted sessions == batch islands (diff > gap breaks)
    // with end = last+gap, cut at final watermark = max ts - 1 day
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Scale.q284StreamSessionWindow(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events"))).toSet
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"))
    val wmf = ev.agg(max("us")).collect().head.getLong(0) - 86400000000L
    val expect = ev
      .withColumn("prev", lag("us", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("us")))
      .withColumn("brk", when(col("prev").isNull ||
        col("us") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("us")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("us").as("start_us"), (max("us") + gapUs).as("end_us"),
        count(lit(1)).as("n_events"))
      .filter(col("end_us") <= wmf)
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == expect,
      "streaming session_window must equal batch islands cut at the final watermark")
    assert(out.nonEmpty, "the watermark cut must still emit sealed sessions")
  }

  test("q285 dropDuplicatesWithinWatermark: probed TTL model — drop while state live, re-admit after lagged eviction") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    // hand replay, one day per micro-batch, delay 2 days: state expiry =
    // accepted ts + delay; eviction at batch COMPLETION with the
    // START-of-batch watermark (one batch behind), so with every day
    // present the re-admit rule is last-accepted <= d - 6:
    //   A active days 1..10          -> emits {1, 7}
    //   B active days {1, 5, 9, 13}  -> emits {1, 9}
    val day = 86400000000L
    val parts = (1 to 13).map { d =>
      val rows = (if (d <= 10) Seq(("A", d * day)) else Nil) ++
        (if (Seq(1, 5, 9, 13).contains(d)) Seq(("B", d * day)) else Nil)
      f"day$d%02d" -> rows.toDF("k", "us")
        .select(col("k"), expr("timestamp_micros(us)").as("ts"))
    }
    val srcDir = graft.sources.Staging.stageParts(parts)
    val schema = spark.read.parquet(srcDir).schema
    val st = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .withWatermark("ts", "2 days").dropDuplicatesWithinWatermark("k")
    graft.streaming.StreamConf.withStatePartitions(spark, 8) {
      st.writeStream.outputMode("append").format("memory")
        .queryName("q285_model").trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          graft.streaming.StreamConf.ckptDir("graft-ttlmodelckpt"))
        .start().awaitTermination()
    }
    val got = spark.table("q285_model")
      .select(col("k"), expr("unix_micros(ts) div 86400000000").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(got == Set("A" -> 1L, "A" -> 7L, "B" -> 1L, "B" -> 9L),
      s"TTL re-admission model drifted: $got")
    // end-to-end at sf0.001: streaming result equals the unrolled greedy
    // chain the DuckDB oracle encodes
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Curation.q285TtlDedup(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("day_us"))).toSet
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d")).distinct()
    val rd = ev.select("d").distinct()
      .withColumn("k", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("d")))
    val thr = rd.as("a").join(rd.as("b"),
        col("b.k") === col("a.k") - 2, "left")
      .select(col("a.d").as("d"), coalesce(col("b.d") - 4, lit(-100000L)).as("thr"))
    val kt = ev.join(thr, "d")
    var acc = kt.groupBy("user_id", "event_type").agg(min("d").as("ad"))
    var all = acc
    (2 to 6).foreach { _ =>
      acc = kt.join(acc, Seq("user_id", "event_type"))
        .filter(col("ad") <= col("thr"))
        .groupBy("user_id", "event_type").agg(min("d").as("ad"))
      all = all.unionByName(acc)
    }
    val expect = all.collect().map(r => (r.getAs[Long]("user_id"),
      r.getAs[String]("event_type"), r.getAs[Long]("ad") * 86400000000L)).toSet
    assert(out == expect, "q285 must equal the unrolled greedy TTL chain")
    assert(out.size > ev.select("user_id", "event_type").distinct().count(),
      "the gate must include at least one RE-admission, not just first-seen")
  }

  test("q217 streaming PSI: emitted windows equal the batch protocol; stragglers missing") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Scale.q217StreamPsi(spark, sf)
      .collect().map(r => (r.getAs[Long]("win_day"), r.getAs[Long]("bin")) ->
        ((r.getAs[Long]("n_w"), r.getAs[Long]("n_base"), r.getAs[Long]("t_w"),
          r.getAs[Long]("t_b"), r.getAs[Long]("diff_num")))).toMap
    val binE = "least(greatest(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div 1000, 0L), 9L)"
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("unix_micros(ts)").as("us"), expr(binE).as("bin"))
    val s1 = ev.filter(pmod(col("user_id"), lit(2)) === 1)
    val wmf = s1.agg(max("us")).collect().head.getLong(0) - 172800000000L
    val base = ev.filter(pmod(col("user_id"), lit(2)) === 0)
      .groupBy("bin").agg(count(lit(1)).as("n_base"))
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_base")).toMap
    val tb = base.values.sum
    val kept = s1
      .filter(!(col("day") <= 19727 && pmod(col("event_id"), lit(7)) === 0))
      .withColumn("win_day", expr("(day div 5) * 5"))
      .filter((col("win_day") + 5) * 86400000000L <= wmf)
      .filter(col("bin").isInCollection(base.keys.toSeq))
      .groupBy("win_day", "bin").agg(count(lit(1)).as("n_w"))
      .collect().map(r => (r.getAs[Long]("win_day"), r.getAs[Long]("bin")) ->
        r.getAs[Long]("n_w")).toMap
    val tw = kept.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val expect = kept.map { case ((w, b), n) =>
      (w, b) -> ((n, base(b), tw(w), tb,
        (n + 1) * (tb + 10) - (base(b) + 1) * (tw(w) + 10)))
    }
    assert(out == expect,
      "emitted PSI rows must equal batch minus stragglers, cut at the final watermark")
    // the straggler drop is real: the early windows' totals fall short of raw
    // windows 19720/19725 cover days < 19730; their emitted total must fall
    // short of the raw count over those days because the stragglers dropped
    val rawEarly = s1.filter(col("day") <= 19729).count()
    val emittedEarly = out.collect { case ((w, _), (n, _, _, _, _)) if w <= 19725L => n }.sum
    assert(emittedEarly < rawEarly, "stragglers must be missing from n_w")
  }

  test("q233 streaming CUSUM: emitted windows equal the batch protocol; fold matches; stragglers missing") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Scale.q233StreamCusum(spark, sf)
      .collect().map(r => (r.getAs[Long]("win_day"), r.getAs[Long]("cents"),
        r.getAs[Long]("n_orders"), r.getAs[Long]("sp"), r.getAs[Long]("sn"),
        r.getAs[String]("alarm")))
    assert(out.nonEmpty)
    val o = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val wmf = o.agg(max("us")).collect().head.getLong(0) - 172800000000L
    val want = o
      .filter(!(col("day") <= 11500L && pmod(col("o_orderkey"), lit(7)) === 0))
      .withColumn("win_day", expr("(day div 5) * 5"))
      .filter((col("win_day") + 5) * 86400000000L <= wmf)
      .groupBy("win_day")
      .agg(sum("cents").as("cents"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("win_day"),
        r.getAs[Long]("cents"), r.getAs[Long]("n")))
      .sortBy(_._1)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq == want.toSeq,
      "emitted windows must equal batch minus stragglers, cut at the final watermark")
    // the straggler drop is real
    val rawEarly = o.filter(col("day") <= 11500L).count()
    val emittedEarly = out.collect { case (w, _, n, _, _, _) if w <= 11495L => n }.sum
    assert(emittedEarly < rawEarly, "stragglers must be missing from the window counts")
    // the CUSUM fold over the emitted windows matches the hand recurrence
    val xs = out.map(_._2)
    val mu = xs.sum / xs.length
    val k = mu / 10
    var sp = 0L; var sn = 0L
    out.foreach { case (_, x, _, gsp, gsn, alarm) =>
      sp = math.max(0L, (if (sp > mu) 0L else sp) + x - mu - k)
      sn = math.max(0L, (if (sn > mu) 0L else sn) + mu - x - k)
      assert((gsp, gsn) == ((sp, sn)))
      val wantAlarm = if (sp > mu && sn > mu) "both"
        else if (sp > mu) "up" else if (sn > mu) "down" else "none"
      assert(alarm == wantAlarm)
    }
  }

  test("q266 streaming histogram quantiles: micro-batch-merged bins equal the batch sketch exactly") {
    val sf = "/root/testdata/sf0.001"
    val batch = graft.operators.Analytics.histogramQuantiles(
        graft.sources.Tables.load(spark, sf, "events")
          .selectExpr("event_type",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v"),
        "event_type", "v", binWidth = 1000L, targetsPct = Seq(50, 95, 99))
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("pct")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("bin"), r.getAs[Long]("est_q"))))
      .toMap
    val streamed = graft.queries.Scale.q266StreamHistQuantiles(spark, sf)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("pct")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("bin"), r.getAs[Long]("est_q"))))
      .toMap
    // mergeability: bins added across micro-batches ≡ bins over all rows,
    // so the post-stream walk must reproduce the batch sketch bit-for-bit
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
  test("q304 timer sessions: equals the replayed gap-run protocol; both close paths exercised") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wmDay = rows.map(_._2).max
    val want = rows.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val byDay = evs.groupBy(_._2).toSeq
        .map { case (d, g) => (d, g.size.toLong, g.map(_._3).sum) }
        .sortBy(_._1)
      val sessions = byDay
        .foldLeft(Vector.empty[Vector[(Long, Long, Long)]]) {
          case (acc, e) if acc.nonEmpty && e._1 - acc.last.last._1 <= 1 =>
            acc.init :+ (acc.last :+ e)
          case (acc, e) => acc :+ Vector(e)
        }
      sessions.zipWithIndex.flatMap { case (ss, i) =>
        val sd = ss.head._1; val ed = ss.last._1
        val isFinal = i == sessions.length - 1
        // probed protocol: rows are processed before expired timers, so a
        // 2-day gap closes on ARRIVAL; >= 3 days the timer fires first in
        // an earlier batch; the final session needs its deadline within
        // the final watermark (= the global max event day, delay 0)
        val closedBy =
          if (isFinal) "timer"
          else if (sessions(i + 1).head._1 - ed == 2) "arrival"
          else "timer"
        if (!isFinal || ed + 1 <= wmDay)
          Some((u, sd * 86400000000L, ed * 86400000000L,
            ss.map(_._2).sum, ss.map(_._3).sum, closedBy))
        else None
      }
    }.sortBy(t => (t._1, t._2))
    val got = graft.queries.Scale.q304TimerSessions(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSeq
    assert(got == want)
    assert(got.exists(_._6 == "timer") && got.exists(_._6 == "arrival"),
      "both close paths must be exercised at this SF")
  }
  test("q306 map-state type counts: per-week profiles equal the replayed cumulative counters") {
    // one event-time WEEK per micro-batch (stageWeeklyEvents): each active
    // (user, week) emits the cumulative profile through that week, stamped
    // with the user's newest active day in it
    val sf = "/root/testdata/sf0.001"
    val rows = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val weeks = evs.map(_._2 / 7).distinct.sorted
      val cum = scala.collection.mutable.Map.empty[String, Long]
      weeks.map { w =>
        val inWeek = evs.filter(_._2 / 7 == w)
        inWeek.foreach { e =>
          cum(e._3) = cum.getOrElse(e._3, 0L) + 1L }
        val (topT, topC) = cum.toSeq.minBy { case (t, c) => (-c, t) }
        (u, inWeek.map(_._2).max * 86400000000L, cum.size.toLong, topT, topC)
      }
    }.sortBy(t => (t._1, t._2))
    val got = graft.queries.Scale.q306TypeCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // monotone: a user's n_types and top_cnt never decrease across weeks
    got.groupBy(_._1).values.foreach { g =>
      val s = g.sortBy(_._2)
      assert(s.sliding(2).forall(p => p.head._3 <= p.last._3))
      assert(s.sliding(2).forall(p => p.head._5 <= p.last._5))
    }
  }
  test("q307 list-state recent purchases: last-3 windows equal the replayed (day, event_id) order") {
    // weekly replay, but the fold sorts each batch by (ts, event_id), so
    // the total arrival order is (day, event_id) — the same order a daily
    // replay gives ("newest" = latest day, never a batch-local event_id
    // inversion across days); one row per active purchase week, stamped
    // with the newest purchase day in it
    val sf = "/root/testdata/sf0.001"
    val buys = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
        col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = buys.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      val ordered = g.toSeq.sortBy(e => (e._2, e._3))
      ordered.map(_._2 / 7).distinct.sorted.map { w =>
        val upto = ordered.takeWhile(_._2 / 7 <= w)
        val wnd = upto.takeRight(3)
        (u, upto.filter(_._2 / 7 == w).map(_._2).max * 86400000000L,
          wnd.length.toLong, wnd.map(_._4).sum, wnd.last._4)
      }
    }.sortBy(t => (t._1, t._2))
    val got = graft.queries.Scale.q307RecentPurchases(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    assert(got.forall(_._3 <= 3L), "window never exceeds K = 3")
    assert(got.exists(_._3 == 3L), "window fills at this SF")
  }
}
