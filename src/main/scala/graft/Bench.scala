package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.atomic.AtomicInteger

/** Headline benchmark (driver contract): runs every SparkEntry query
  * against SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Pass structure (round-12 redesign — the round-11 shape ran all ~309
  * queries 5x (warmup + pre-stage + 3 timed) and blew the driver's
  * 60-minute budget, BENCH_r11.json rc=124/parsed=null):
  *   1. warmup    @ sf0.001 — BATCH queries only (codegen + JIT warm).
  *                 Streaming replays are a scale-independent micro-batch
  *                 floor; paying it at sf0.001 warms nothing the target-SF
  *                 pre-stage pass doesn't.
  *   2. pre-stage @ target SF — ONLY SparkEntry.stagedQueries (streaming
  *                 replays, TxStore commit sequences, bucketed-table
  *                 writes). Staging happens on first touch of a dir; this
  *                 keeps that one-off cost out of the timed passes without
  *                 re-executing the whole suite (654 s in round 11).
  *   3. timed     @ target SF — batch queries median-of-3; streaming
  *                 queries ONCE (their spread is the replay floor, not
  *                 noise — a median over it buys no signal at 2x the cost).
  *
  * The artifact is written INCREMENTALLY to SPARK_GRAFT_BENCH_OUT (default
  * /root/repo/BENCH_incremental.json): after every query the full JSON —
  * valid at all times, "partial":true until the suite completes — is
  * rewritten, so a timeout/kill still leaves per-query numbers for every
  * completed query instead of round 11's empty artifact. The final stdout
  * line (the driver's parse target) is emitted once, at the end.
  *
  * Budget self-report: `main_wall_sec` in the JSON is the whole main()
  * wall; the quiet-host target is <= 2000 s so a 1.5-2x contended run
  * still fits the driver's 3600 s kill window (BASELINE.md records the
  * round-11 forensics). */
object Bench {
  private def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val m0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/BENCH_incremental.json")
    val spark = session(cpus)
    val warmDir = "/root/testdata/sf0.001"
    // Optional name-regex filter for single-query iteration (dev only; the
    // driver never sets it, so the recorded bench always covers the suite).
    val queries = sys.env.get("SPARK_GRAFT_ONLY")
      .map(re => SparkEntry.queries.filter(_._1.matches(re)))
      .getOrElse(SparkEntry.queries)
    val streamingSet = SparkEntry.streamingQueries.filter(queries.contains)
    val stagedSet = SparkEntry.stagedQueries.filter(queries.contains)
    // Runtime cross-check of the declared streaming set: QueryStartedEvent
    // is posted synchronously from the starting thread, so a per-query
    // before/after counter diff attributes starts correctly even though
    // the other listener callbacks are async.
    val streamStarts = new AtomicInteger(0)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        streamStarts.incrementAndGet()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val undeclaredStreaming = scala.collection.mutable.LinkedHashSet.empty[String]
    // `loud` marks TIMED runs: errors print, and the undeclared-streaming
    // check applies. Warmup/pre-stage runs are exempt — a staged-store
    // build may legitimately run a one-time stream on first touch of a
    // dir (q157's MV store) without the QUERY being a streaming query.
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                s: SparkSession, dir: String, loud: Boolean): Unit = {
      val before = streamStarts.get()
      // materialize the query's OWN physical plan (toRdd), not a count()
      // on top: count() re-optimizes and can legally eliminate
      // row-preserving work (e.g. q204's unique-key left join — and with
      // it the whole dedup pipeline), silently under-measuring the query
      try fn(s, dir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        // a broken query must not silently bench as ~0 s: Verify is the
        // loud gate, but the bench tail should show the failure too
        if (loud)
          System.err.println(s"BENCH-ERROR $name: ${e.getClass.getName}: ${e.getMessage}")
      }
      if (loud && streamStarts.get() > before && !SparkEntry.streamingQueries(name))
        undeclaredStreaming += name
      // release per-operator persisted intermediates between runs —
      // including localCheckpoint blocks clearCache() misses (see
      // SessionHygiene for the round-10 forensics + the no-cross-query-
      // RDD invariant this depends on)
      SessionHygiene.releaseQueryState(s)
    }
    // 1. Warm-up at the smallest SF, batch queries only: compiles every
    // batch plan (whole-stage codegen) and warms the JIT so the timed pass
    // measures steady-state execution. Staged/streaming queries warm at
    // the TARGET SF in the pre-stage pass instead — running them here too
    // would pay their replay floor twice (608 s warmup in round 11).
    val w0 = System.nanoTime()
    queries.foreach { case (name, fn) =>
      if (!stagedSet(name)) runOnce(name, fn, spark, warmDir, loud = false)
    }
    val warmupSec = (System.nanoTime() - w0) / 1e9
    // 2. Pre-stage at the TARGET SF: staged-store queries (TxStore
    // commits, streaming replays, bucketed writes) build their store on
    // first touch of a dir — without this, that one-off staging cost lands
    // inside the first timed pass and shows up as a 10-35x max/min spread
    // artifact (round-8 forensics: q45/q90/q92/q152/q157). This pass also
    // warms codegen for these queries against the target schemas.
    val p0 = System.nanoTime()
    queries.foreach { case (name, fn) =>
      if (stagedSet(name)) runOnce(name, fn, spark, sfDir, loud = false)
    }
    val prestageSec = (System.nanoTime() - p0) / 1e9
    // 3. Timed passes. Median of 3 for batch queries: single-shot timings
    // on a shared host swing 2-4x under outside load (BASELINE.md), wider
    // than the bars being graded — the median damps one-off spikes while
    // staying honest about steady-state cost. Streaming queries run ONCE:
    // their cost is the deterministic micro-batch replay floor, already
    // measured to within ~10% by a single run (round-11 per-pass data),
    // and 3x-ing a ~135 s floor is pure budget burn.
    val done = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    def jsonSnapshot(partial: Boolean, isolatedNames: Seq[String],
                     timedSec: Double): String = {
      val qs = done.map { case (k, t) => s"\"" + k + "\":" + t(t.size / 2) }
        .mkString("{", ",", "}")
      val spread = done
        .map { case (k, t) => s"""\"$k\":{"min":${t.head},"max":${t.last}}""" }
        .mkString("{", ",", "}")
      val total = if (done.nonEmpty) done.values.map(t => t(t.size / 2)).sum else 0.0
      val isoJson = isolatedNames.map(n => s"\"$n\"").mkString("[", ",", "]")
      val onceJson = done.keys.filter(streamingSet).map(n => s"\"$n\"")
        .mkString("[", ",", "]")
      val undeclJson = undeclaredStreaming.map(n => s"\"$n\"").mkString("[", ",", "]")
      val mainWall = (System.nanoTime() - m0) / 1e9
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""spread":$spread,"isolated":$isoJson,"streaming_once":$onceJson,""" +
        s""""undeclared_streaming":$undeclJson,"warmup_sec":$warmupSec,""" +
        s""""prestage_sec":$prestageSec,"timed_sec":$timedSec,""" +
        s""""main_wall_sec":$mainWall,"partial":$partial,"sf":"$sfDir"}"""
    }
    def writeOut(json: String): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        json.getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"BENCH-WARN artifact write failed: ${e.getMessage}") }
    val t0All = System.nanoTime()
    queries.foreach { case (name, fn) =>
      val passes = if (streamingSet(name)) 1 else 3
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        runOnce(name, fn, spark, sfDir, loud = true)
        (System.nanoTime() - t0) / 1e9
      }
      done(name) = times.sorted
      // incremental artifact: valid JSON after every query, so a driver
      // timeout (round 11: rc=124, parsed=null) still leaves per-query
      // numbers for everything completed so far
      writeOut(jsonSnapshot(partial = true, Seq.empty,
        (System.nanoTime() - t0All) / 1e9))
    }
    val timedSec = (System.nanoTime() - t0All) / 1e9
    // Isolation pass (SPARK_GRAFT_ISOLATE=1, dev-only — the driver never
    // sets it): in-suite medians can carry 10-30x one-query swings from
    // host contention or suite-level storage pressure (round-10: q67
    // measured 7.98 s in-suite, 5.56 s isolated, code untouched). For
    // every BATCH query whose max/min spread exceeds 3x (streaming runs
    // once — no spread to flag), re-measure median-of-3 in a FRESH
    // SparkSession (same warmed JVM/JIT, new context — so executor
    // storage and scheduler state start clean) and substitute the
    // isolated numbers; the artifact lists which queries were re-measured
    // so the substitution is machine-visible.
    val isolate = sys.env.get("SPARK_GRAFT_ISOLATE").contains("1")
    // spread threshold tunable for testing the isolation path itself
    // (SPARK_GRAFT_ISOLATE_SPREAD=0 flags every query slower than the
    // 1 s absolute floor below)
    val spreadBar = sys.env.get("SPARK_GRAFT_ISOLATE_SPREAD")
      .map(_.toDouble).getOrElse(3.0)
    // absolute floor alongside the ratio: sub-second queries trip a 3x
    // ratio on pure scheduling noise (q250: 0.15 s min / 0.4 s max) and
    // each isolation re-measure costs a fresh-session warm — only spreads
    // that cost real wall time are worth re-measuring
    val flagged: Seq[String] =
      if (!isolate) Seq.empty
      else done.collect {
        case (name, t) if t.size > 1 && t.head > 0 &&
          t.last / t.head > spreadBar && t.last > 1.0 => name
      }.toSeq
    if (flagged.nonEmpty) {
      spark.stop()
      flagged.foreach { name =>
        val s2 = session(cpus)
        val fn = queries(name)
        try fn(s2, sfDir).queryExecution.toRdd.count() // fresh-context warm
        catch { case _: Throwable => () }
        SessionHygiene.releaseQueryState(s2)
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          try fn(s2, sfDir).queryExecution.toRdd.count()
          catch { case e: Throwable =>
            System.err.println(s"BENCH-ERROR $name (isolated): ${e.getClass.getName}: ${e.getMessage}")
          }
          val dt = (System.nanoTime() - t0) / 1e9
          SessionHygiene.releaseQueryState(s2)
          dt
        }
        s2.stop()
        done(name) = times.sorted.toSeq
        writeOut(jsonSnapshot(partial = true, flagged.takeWhile(_ != name) :+ name,
          timedSec))
      }
    }
    // `queries` stays the scalar median map (the graded shape); `spread`
    // carries {min, max} per query and the *_sec fields the per-pass wall
    // times, so a contended run (outside load on this shared host) is
    // machine-detectable from the artifact itself — a quiet run shows
    // max/min within ~2x, a contended one 10x+ (round-6 forensics).
    val json = jsonSnapshot(partial = false, flagged, timedSec)
    println(json)
    writeOut(json)
    spark.stop()
  }
}
