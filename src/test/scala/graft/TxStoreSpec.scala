package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxStore

/** Snapshot-isolated copy-on-write store: upsert correctness, bucket-scoped
  * rewrites, time travel, immutability, and optimistic-commit conflicts. */
class TxStoreSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def freshPath(): String =
    Files.createTempDirectory("graft-txstore").resolve("tbl").toString

  private def rows(vs: (Long, String)*) = vs.toSeq.toDF("entity_id", "v")

  test("init + read round-trip; merge upserts with delta-wins semantics") {
    val p = freshPath()
    TxStore.init(rows(1L -> "a", 2L -> "b", 3L -> "c"), p, "entity_id", nBuckets = 4)
    assert(TxStore.read(spark, p).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
    val v = TxStore.merge(spark, p, rows(2L -> "B", 4L -> "d"), "entity_id")
    assert(v == 1)
    assert(TxStore.read(spark, p).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))
  }

  test("merge rewrites ONLY touched buckets; untouched buckets stay referenced at v0") {
    val p = freshPath()
    // enough keys that with 8 buckets some bucket holds no delta key
    TxStore.init((1L to 64L).map(i => (i, s"v$i")).toDF("entity_id", "v"),
      p, "entity_id", nBuckets = 8)
    TxStore.merge(spark, p, rows(7L -> "X"), "entity_id")
    val manifest = Files.readAllLines(
      Paths.get(p, "_manifests", "v000001.manifest"))
    // header: nbuckets= line + schema= line, then file entries
    val dataLines = manifest.subList(2, manifest.size())
    val v1Lines = dataLines.stream().filter(l => !l.contains("v0/")).count()
    val v0Lines = dataLines.stream().filter(_.contains("v0/")).count()
    // exactly the delta key's bucket was rewritten; everything else is
    // still the v0 files by reference
    assert(v1Lines >= 1 && v0Lines >= 1, s"v0=$v0Lines v1=$v1Lines")
    val v1Buckets = dataLines.stream().filter(l => !l.contains("v0/"))
      .map(_.split("\t")(0)).distinct().count()
    assert(v1Buckets == 1)
  }

  test("time travel: historical snapshots stay readable after a merge (COW)") {
    val p = freshPath()
    TxStore.init(rows(1L -> "a", 2L -> "b"), p, "entity_id", nBuckets = 2)
    TxStore.merge(spark, p, rows(1L -> "A2"), "entity_id")
    TxStore.merge(spark, p, rows(2L -> "B3"), "entity_id")
    assert(TxStore.read(spark, p, Some(0)).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b"))
    assert(TxStore.read(spark, p, Some(1)).as[(Long, String)].collect().toSet ==
      Set(1L -> "A2", 2L -> "b"))
    assert(TxStore.read(spark, p).as[(Long, String)].collect().toSet ==
      Set(1L -> "A2", 2L -> "B3"))
  }

  test("concurrent commit of the same version raises, committed state unharmed") {
    val p = freshPath()
    TxStore.init(rows(1L -> "a"), p, "entity_id", nBuckets = 2)
    // this writer derived its delta from v0 (CAS pin) — then a concurrent
    // writer wins the v1 commit before it lands
    Files.write(Paths.get(p, "_manifests", "v000001.manifest"),
      Files.readAllBytes(Paths.get(p, "_manifests", "v000000.manifest")))
    intercept[java.util.ConcurrentModificationException] {
      TxStore.merge(spark, p, rows(1L -> "loser"), "entity_id",
        expectedVersion = Some(0))
    }
    // the winning v1 (a copy of v0 here) is untouched by the failed merge
    assert(TxStore.read(spark, p, Some(1)).as[(Long, String)].collect().toSet ==
      Set(1L -> "a"))
    // the loser's staged data dir was cleaned up on the CAS failure — only
    // the v0 dir (the one the manifests reference) remains
    val listing = Files.list(Paths.get(p, "data"))
    val dirs = try listing.iterator().asScala.map(_.getFileName.toString).toSet
      finally listing.close()
    assert(dirs == Set("v0"), s"orphaned staging dirs: ${dirs - "v0"}")
  }

  test("init on an empty frame commits an entry-less snapshot that reads back empty") {
    val p = freshPath()
    TxStore.init(rows().limit(0), p, "entity_id", nBuckets = 4)
    val back = TxStore.read(spark, p)
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSeq == Seq("entity_id", "v"))
    // and a merge into the empty store works (all buckets are fresh)
    TxStore.merge(spark, p, rows(1L -> "a"), "entity_id")
    assert(TxStore.read(spark, p).as[(Long, String)].collect().toSet == Set(1L -> "a"))
  }

  test("currentVersion parses manifests past the 6-digit zero-pad width") {
    val p = freshPath()
    val mdir = Paths.get(p, "_manifests")
    Files.createDirectories(mdir)
    Files.write(mdir.resolve("v000003.manifest"), "nbuckets=2\nschema={}".getBytes)
    Files.write(mdir.resolve("v1000000.manifest"), "nbuckets=2\nschema={}".getBytes)
    assert(TxStore.currentVersion(p) == 1000000)
  }

  test("vacuum removes dirs no manifest references, keeps every referenced dir") {
    val p = freshPath()
    TxStore.init(rows(1L -> "a", 2L -> "b"), p, "entity_id", nBuckets = 2)
    TxStore.merge(spark, p, rows(1L -> "A2"), "entity_id")
    // simulate a crashed writer: staged dir, no manifest
    Files.createDirectories(Paths.get(p, "data", "v2-deadbeef", "__bucket=0"))
    val deleted = TxStore.vacuum(p)
    assert(deleted == Seq("v2-deadbeef"))
    // both committed snapshots still read (time travel intact)
    assert(TxStore.read(spark, p, Some(0)).count() == 2)
    assert(TxStore.read(spark, p).as[(Long, String)].collect().toSet ==
      Set(1L -> "A2", 2L -> "b"))
  }

  test("compact collapses merge history into one data dir; history stays readable") {
    val p = freshPath()
    TxStore.init((1L to 16L).map(i => (i, s"v$i")).toDF("entity_id", "v"),
      p, "entity_id", nBuckets = 4)
    TxStore.merge(spark, p, rows(3L -> "X"), "entity_id")
    TxStore.merge(spark, p, rows(9L -> "Y"), "entity_id")
    val cv = TxStore.compact(spark, p)
    assert(cv == 3)
    val expect = ((1L to 16L).map(i => (i, s"v$i")).toMap ++ Map(3L -> "X", 9L -> "Y")).toSet
    assert(TxStore.read(spark, p).as[(Long, String)].collect().toSet == expect)
    // compacted manifest references exactly one version dir
    val manifest = Files.readAllLines(Paths.get(p, "_manifests", "v000003.manifest"))
    val vdirs = manifest.subList(2, manifest.size()).asScala
      .map(_.split("\t", 2)(1).split("/", 2)(0)).toSet
    assert(vdirs.size == 1)
    // pre-compaction snapshot still time-travels
    assert(TxStore.read(spark, p, Some(1)).as[(Long, String)].collect()
      .toMap.apply(3L) == "X")
  }

  test("additive schema evolution: widening delta nulls old rows, time travel keeps old schema") {
    val p = freshPath()
    TxStore.init(rows(1L -> "a", 2L -> "b"), p, "entity_id", nBuckets = 2)
    // delta adds a 'score' column; key 2 upserted, key 1 untouched
    val wide = Seq((2L, "B", 0.9), (3L, "c", 0.5)).toDF("entity_id", "v", "score")
    val v1 = TxStore.merge(spark, p, wide, "entity_id")
    val cur = TxStore.read(spark, p)
    assert(cur.columns.toSeq == Seq("entity_id", "v", "score"))
    val byId = cur.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(2), "pre-evolution row must read the added column as null")
    assert(byId(2L).getDouble(2) == 0.9 && byId(3L).getDouble(2) == 0.5)
    // time travel: v0 still presents the ORIGINAL two-column schema
    assert(TxStore.read(spark, p, Some(0)).columns.toSeq == Seq("entity_id", "v"))
    // compaction materializes the widened schema and stays readable
    TxStore.compact(spark, p)
    assert(TxStore.read(spark, p).columns.toSeq == Seq("entity_id", "v", "score"))
    assert(TxStore.read(spark, p).count() == 3)
    // a later plain merge (old columns only) is rejected — additive only
    val err = intercept[IllegalArgumentException] {
      TxStore.merge(spark, p, rows(4L -> "d"), "entity_id")
    }
    assert(err.getMessage.contains("missing stored column"))
    assert(v1 == 1)
  }

  test("txn ledger: tagged merges record the max batch id; untagged merges carry it") {
    val p = freshPath()
    TxStore.init(rows(1L -> "a"), p, "entity_id", nBuckets = 2)
    assert(TxStore.lastTxn(p).isEmpty) // pre-ledger manifests parse as None
    TxStore.merge(spark, p, rows(2L -> "b"), "entity_id", txn = Some(0L))
    assert(TxStore.lastTxn(p).contains(0L))
    TxStore.merge(spark, p, rows(3L -> "c"), "entity_id") // untagged: ledger survives
    assert(TxStore.lastTxn(p).contains(0L))
    TxStore.merge(spark, p, rows(4L -> "d"), "entity_id", txn = Some(5L))
    assert(TxStore.lastTxn(p).contains(5L))
  }

  test("exactlyOnceSink: replayed batch ids are skipped, new ids commit") {
    import graft.streaming.StreamingIngest
    val p = freshPath()
    TxStore.init(rows(), p, "entity_id", nBuckets = 2)
    val sink = StreamingIngest.exactlyOnceSink(p, "entity_id") _
    sink(rows(1L -> "a"), 0L)
    sink(rows(2L -> "b"), 1L)
    val vAfter = TxStore.currentVersion(p)
    // restart replays batches 0 and 1 with different (stale) content —
    // the ledger must skip them: no new version, no data change
    sink(rows(1L -> "STALE"), 0L)
    sink(rows(2L -> "STALE"), 1L)
    assert(TxStore.currentVersion(p) == vAfter)
    assert(TxStore.read(spark, p).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b"))
    // genuinely new batch commits
    sink(rows(3L -> "c"), 2L)
    assert(TxStore.lastTxn(p).contains(2L))
    assert(TxStore.read(spark, p).count() == 3)
  }

  test("freshen delta merges transactionally (write-back integration)") {
    // the engine's scored output is exactly a delta: upsert it
    val p = freshPath()
    TxStore.init(rows(1L -> "stale", 2L -> "fresh"), p, "entity_id", nBuckets = 2)
    val scoredDelta = rows(1L -> "rescored")
    TxStore.merge(spark, p, scoredDelta, "entity_id")
    assert(TxStore.read(spark, p).as[(Long, String)].collect().toSet ==
      Set(1L -> "rescored", 2L -> "fresh"))
  }

  // --------------------------------------------------------- zone maps

  private def tsRows(vs: (Long, Long)*) = vs.toSeq.toDF("entity_id", "ts_us")

  test("zone maps: time-clustered merges prune range reads; answer unchanged") {
    val p = freshPath()
    // three time-sliced commits — the append-stream layout where zone maps
    // shine: each commit's files cover a disjoint ts range
    TxStore.init(tsRows((1L to 20L).map(i => (i, 100L + i)): _*), p,
      "entity_id", nBuckets = 4, statsCols = Seq("ts_us"))
    TxStore.merge(spark, p, tsRows((21L to 40L).map(i => (i, 200L + i)): _*), "entity_id")
    TxStore.merge(spark, p, tsRows((41L to 60L).map(i => (i, 300L + i)): _*), "entity_id")
    val (kept, total) = TxStore.pruneCount(p, "ts_us", 301L, 400L)
    assert(kept < total, s"no pruning: kept $kept of $total")
    val pruned = TxStore.readWhere(spark, p, "ts_us", 301L, 400L)
      .as[(Long, Long)].collect().toSet
    val full = TxStore.read(spark, p).filter($"ts_us".between(301L, 400L))
      .as[(Long, Long)].collect().toSet
    assert(pruned == full && pruned.size == 20)
  }

  test("zone maps: stats survive merges on untouched buckets; compact recomputes") {
    val p = freshPath()
    TxStore.init(tsRows((1L to 32L).map(i => (i, i)): _*), p,
      "entity_id", nBuckets = 8, statsCols = Seq("ts_us"))
    TxStore.merge(spark, p, tsRows(1L -> 1000L), "entity_id")
    // v0 files (untouched buckets) kept their stats: a range that excludes
    // them still prunes
    val (kept, total) = TxStore.pruneCount(p, "ts_us", 900L, 1100L)
    assert(kept < total)
    assert(TxStore.readWhere(spark, p, "ts_us", 900L, 1100L).count() == 1)
    TxStore.compact(spark, p)
    // post-compact stats still present and correct
    val (k2, t2) = TxStore.pruneCount(p, "ts_us", 900L, 1100L)
    assert(k2 <= t2 && TxStore.readWhere(spark, p, "ts_us", 900L, 1100L).count() == 1)
  }

  test("readKey touches one bucket only and returns the exact row") {
    val p = freshPath()
    TxStore.init(rows((1L to 64L).map(i => (i, s"v$i")): _*), p, "entity_id", nBuckets = 8)
    val got = TxStore.readKey(spark, p, "entity_id", 17L)
      .as[(Long, String)].collect()
    assert(got.toSeq == Seq(17L -> "v17"))
    // the pruned plan reads 1/8 of the files: verify via the physical scan
    val files = TxStore.readKey(spark, p, "entity_id", 17L).queryExecution
      .executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }.sum
    val allFiles = TxStore.read(spark, p).queryExecution
      .executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }.sum
    assert(files < allFiles, s"point read touched $files of $allFiles files")
  }

  test("readFor: bulk keyed read prunes to the keys' buckets, exact rows") {
    val p = freshPath()
    TxStore.init(rows((1L to 64L).map(i => (i, s"v$i")): _*), p, "entity_id", nBuckets = 8)
    val keys = Seq(3L, 17L).toDF("entity_id")
    val got = TxStore.readFor(spark, p, "entity_id", keys)
      .as[(Long, String)].collect().toSet
    assert(got == Set(3L -> "v3", 17L -> "v17"))
    def scanned(df: org.apache.spark.sql.DataFrame): Int = df.queryExecution
      .executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.inputFiles.exists(_.contains("graft-txstore")) =>
          f.relation.location.inputFiles.length
      }.sum
    val pruned = scanned(TxStore.readFor(spark, p, "entity_id", keys))
    val full = scanned(TxStore.read(spark, p))
    assert(pruned < full, s"readFor touched $pruned of $full files")
  }

  test("delete: COW erasure of keys; untouched buckets by reference; time travel keeps them") {
    val p = freshPath()
    TxStore.init(rows((1L to 64L).map(i => (i, s"v$i")): _*), p, "entity_id", nBuckets = 8)
    val v = TxStore.delete(spark, p, Seq(7L, 8L).toDF("entity_id"), "entity_id")
    assert(v == 1)
    val cur = TxStore.read(spark, p).as[(Long, String)].collect().toMap
    assert(cur.size == 62 && !cur.contains(7L) && !cur.contains(8L))
    // pre-delete snapshot still holds the rows (erasure is per-snapshot)
    assert(TxStore.read(spark, p, Some(0)).count() == 64)
    // untouched buckets re-entered by reference: the v1 manifest still
    // points at v0 files for some buckets
    val manifest = Files.readAllLines(Paths.get(p, "_manifests", "v000001.manifest"))
    assert(manifest.stream().anyMatch(_.contains("v0/")))
    // deleting absent keys is a no-op version-wise
    val v2 = TxStore.delete(spark, p, Seq(9999L).toDF("entity_id"), "entity_id")
    assert(TxStore.read(spark, p, Some(v2)).count() == 62)
  }

  test("CAS loser retries against the new current and both deltas land") {
    val p = freshPath()
    TxStore.init(rows(1L -> "a", 2L -> "b"), p, "entity_id", nBuckets = 2)
    // writer A commits v1 first
    TxStore.merge(spark, p, rows(1L -> "A"), "entity_id", expectedVersion = Some(0))
    // writer B derived its delta from v0 too: its CAS commit of v1 must fail...
    intercept[java.util.ConcurrentModificationException] {
      TxStore.merge(spark, p, rows(2L -> "B"), "entity_id", expectedVersion = Some(0))
    }
    // ...and the documented recovery — re-read current, re-merge — succeeds
    val v2 = TxStore.merge(spark, p, rows(2L -> "B"), "entity_id",
      expectedVersion = Some(TxStore.currentVersion(p)))
    assert(v2 == 2)
    assert(TxStore.read(spark, p).as[(Long, String)].collect().toSet ==
      Set(1L -> "A", 2L -> "B")) // neither writer's delta was lost
  }

  test("two writers racing from the same snapshot on real threads: one CAS win per version, history linear, no delta lost") {
    val p = freshPath()
    TxStore.init(rows(1L -> "a", 2L -> "b"), p, "entity_id", nBuckets = 2)
    val start = new java.util.concurrent.CountDownLatch(1)
    val retries = new java.util.concurrent.atomic.AtomicInteger(0)
    def writer(delta: (Long, String)): Thread = {
      val t = new Thread(() => {
        start.await()
        var committed = false
        var attempts = 0
        while (!committed && attempts < 10) {
          attempts += 1
          try {
            TxStore.merge(spark, p, rows(delta), "entity_id",
              expectedVersion = Some(TxStore.currentVersion(p)))
            committed = true
          } catch {
            case _: java.util.ConcurrentModificationException =>
              retries.incrementAndGet() // lost the CAS — re-read and retry
          }
        }
        assert(committed, s"writer $delta never committed in 10 attempts")
      })
      t.start(); t
    }
    val (a, b) = (writer(1L -> "A"), writer(2L -> "B"))
    start.countDown(); a.join(120000); b.join(120000)
    // both deltas landed regardless of commit order or CAS retries
    assert(TxStore.read(spark, p).as[(Long, String)].collect().toSet ==
      Set(1L -> "A", 2L -> "B"))
    // history is linear: exactly v0..v2, each snapshot readable, and the
    // losing writer's abandoned staging dirs were cleaned up on the spot
    assert(TxStore.currentVersion(p) == 2)
    (0 to 2).foreach(v => TxStore.read(spark, p, Some(v)).collect())
    assert(TxStore.vacuum(p).isEmpty, "CAS loser left orphaned staging dirs")
  }

  test("expire: drops old snapshots and their exclusive files, keeps the window") {
    val p = freshPath()
    TxStore.init(rows((1L to 32L).map(i => (i, s"v$i")): _*), p, "entity_id", nBuckets = 4)
    TxStore.merge(spark, p, rows(1L -> "A"), "entity_id")   // v1
    TxStore.merge(spark, p, rows(2L -> "B"), "entity_id")   // v2
    val dropped = TxStore.expire(p, keepFrom = 2)
    // v0/v1 gone; v2 intact and still correct
    val err = intercept[IllegalArgumentException] { TxStore.read(spark, p, Some(0)) }
    assert(err.getMessage.contains("expired"))
    intercept[IllegalArgumentException] { TxStore.read(spark, p, Some(1)) }
    val cur = TxStore.read(spark, p).as[(Long, String)].collect().toMap
    assert(cur.size == 32 && cur(1L) == "A" && cur(2L) == "B")
    // v0's untouched-bucket files are still referenced by v2 ⇒ NOT deleted;
    // only dirs exclusive to dropped manifests go (v1's rewrite of bucket(1),
    // superseded where v2 re-pointed — may be empty if v2 still references it)
    val dataDirs = Files.list(Paths.get(p, "data")).toArray.map(_.toString)
    assert(dataDirs.exists(_.endsWith("/v0")), "v0 dir still referenced by v2")
    dropped.foreach(d => assert(!dataDirs.exists(_.endsWith(s"/$d"))))
  }

  test("stores without statsCols read unchanged (manifest back-compat)") {
    val p = freshPath()
    TxStore.init(rows(1L -> "a"), p, "entity_id", nBuckets = 2)
    // no stats declared: pruning keeps everything, readWhere still correct
    val (kept, total) = TxStore.pruneCount(p, "entity_id", 0L, 10L)
    assert(kept == total)
    assert(TxStore.readWhere(spark, p, "entity_id", 1L, 1L).count() == 1)
  }

  test("clustered compaction: sortCols + maxRecordsPerFile tighten zone maps within a bucket") {
    val p = freshPath()
    // ONE bucket so all pruning must come from within-bucket clustering;
    // ts values deliberately interleaved across two commits so every
    // pre-compaction file spans the whole ts range (zone maps useless)
    TxStore.init(tsRows((1L to 40L by 2).map(i => (i, 100L + i * 10L)): _*).coalesce(1),
      p, "entity_id", nBuckets = 1, statsCols = Seq("ts_us"))
    TxStore.merge(spark, p,
      tsRows((2L to 40L by 2).map(i => (i, 100L + i * 10L)): _*).coalesce(1), "entity_id")
    val before = TxStore.read(spark, p).as[(Long, Long)].collect().toSet
    val (k0, t0) = TxStore.pruneCount(p, "ts_us", 110L, 150L)
    assert(k0 == t0, "interleaved files must NOT prune before clustering")
    val (nv, fb, fa) = TxStore.compactBuckets(spark, p,
      sortCols = Seq("ts_us"), maxRecordsPerFile = 10L)
    assert(nv >= 1 && fa >= 4, s"expected >=4 sorted chunk files, got $fa (from $fb)")
    // content identical, narrow range now prunes most chunk files
    assert(TxStore.read(spark, p).as[(Long, Long)].collect().toSet == before)
    val (k1, t1) = TxStore.pruneCount(p, "ts_us", 110L, 150L)
    assert(k1 < t1, s"clustered files must prune: kept $k1 of $t1")
    assert(TxStore.readWhere(spark, p, "ts_us", 110L, 150L)
      .as[(Long, Long)].collect().toSet == before.filter(r => r._2 >= 110L && r._2 <= 150L))
  }

  test("compactBuckets: only fragmented buckets rewritten, content identical, history intact") {
    val p = freshPath()
    // single-partition init: v0 is exactly one file per bucket, so the only
    // fragmentation below comes from the merges
    TxStore.init((1L to 64L).map(i => (i, s"v$i")).toDF("entity_id", "v").coalesce(1),
      p, "entity_id", nBuckets = 8)
    // fragment a couple of buckets with repeated single-key merges (the
    // base partition and the delta partition both write into the bucket)
    TxStore.merge(spark, p, rows(7L -> "x1"), "entity_id")
    TxStore.merge(spark, p, rows(7L -> "x2"), "entity_id")
    TxStore.merge(spark, p, rows(9L -> "y1"), "entity_id")
    val before = TxStore.read(spark, p).as[(Long, String)].collect().toSet
    val vPre = TxStore.currentVersion(p)
    val (nv, fBefore, fAfter) = TxStore.compactBuckets(spark, p)
    assert(nv == vPre + 1 && fAfter < fBefore, s"$fBefore -> $fAfter")
    // content bit-identical; fragmented buckets now one file each
    assert(TxStore.read(spark, p).as[(Long, String)].collect().toSet == before)
    val manifest = Files.readAllLines(
      Paths.get(p, "_manifests", f"v$nv%06d.manifest"))
    val entries = manifest.subList(2, manifest.size()).asScala
      .map(_.split("\t")).map(a => a(0).toInt -> a(1))
    assert(entries.groupBy(_._1).values.forall(_.size == 1),
      "every bucket must be a single file after full-threshold compaction")
    // untouched buckets still referenced from v0 by name (no rewrite)
    assert(entries.exists(_._2.startsWith("v0/")), "untouched buckets must stay by reference")
    // pre-compaction snapshot still time-travels to the same content
    assert(TxStore.read(spark, p, version = Some(vPre))
      .as[(Long, String)].collect().toSet == before)
    // a second pass is a no-op at the same version
    val (nv2, b2, a2) = TxStore.compactBuckets(spark, p)
    assert(nv2 == nv && b2 == a2)
  }
}
