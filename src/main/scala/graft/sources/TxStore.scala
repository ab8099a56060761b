package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional copy-on-write table: versioned MANIFESTS over immutable
  * bucket-partitioned parquet files — the upgrade of the partition-scoped
  * dynamic overwrite (`FreshReader.writeBackDelta`) to real snapshot
  * isolation, built from primitives any shared filesystem offers.
  *
  * Layout:
  * {{{
  *   <path>/data/v<N>/__bucket=<b>/part-*.parquet   -- immutable once written
  *   <path>/_manifests/v<N>.manifest                -- snapshot = file list
  * }}}
  * A manifest lists every (bucket, file) of its snapshot; the CURRENT
  * snapshot is the highest manifest version. A merge writes NEW files for
  * touched buckets only, re-points untouched buckets at their existing
  * files, and commits by atomically creating the next manifest — readers
  * see the old snapshot or the new one, never a mix, and historical
  * versions stay readable (time travel) until compacted away.
  *
  * Commit protocol: the manifest is staged to a temp name and hard-linked
  * to `v<N+1>.manifest` — link(2) is the filesystem's atomic put-if-absent,
  * failing with EEXIST if a concurrent writer committed first (optimistic
  * concurrency — the caller retries on the resulting
  * ConcurrentModificationException). On an object store the same protocol
  * rides the store's native put-if-absent precondition.
  *
  * Scale: rows shuffle once (by bucket) per merge; the merge reads ONLY
  * touched buckets' files; manifests are metadata (O(files)), handled
  * driver-side exactly like every table format's metadata layer. The
  * reference's write-back is per-entity `put` (KijiFreshProducerContext
  * .java:91-131) against HBase's own LSM versioning; this is that
  * durability contract re-expressed for immutable-file storage.
  */
object TxStore {

  /** Deterministic bucket of a key — same function for init and merge, so
    * a key's rows always live in one bucket. */
  private def bucketOf(c: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(c), lit(nBuckets.toLong)).cast("int")

  private def manifestDir(path: String): Path = Paths.get(path, "_manifests")
  private def manifestPath(path: String, v: Int): Path =
    manifestDir(path).resolve(f"v$v%06d.manifest")

  /** Highest committed snapshot version, or -1 if none. */
  def currentVersion(path: String): Int = {
    val dir = manifestDir(path)
    if (!Files.isDirectory(dir)) -1
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{6}\\.manifest") => s.substring(1, 7).toInt }
      .foldLeft(-1)(math.max)
  }

  /** Manifest of `v`: header nBuckets, then (bucket, version-dir-relative
    * file) entries. */
  private def readManifest(path: String, v: Int): (Int, Seq[(Int, String)]) = {
    val lines = Files.readAllLines(manifestPath(path, v)).asScala.toSeq
    val n = lines.head.stripPrefix("nbuckets=").toInt
    (n, lines.tail.map { l =>
      val Array(b, f) = l.split("\t", 2); (b.toInt, f)
    })
  }

  private def commitManifest(path: String, v: Int, nBuckets: Int,
      entries: Seq[(Int, String)]): Unit = {
    Files.createDirectories(manifestDir(path))
    val tmp = Files.createTempFile(manifestDir(path), s"staged-v$v-", ".tmp")
    val body = (s"nbuckets=$nBuckets" +: entries.map { case (b, f) => s"$b\t$f" })
      .mkString("\n")
    Files.write(tmp, body.getBytes("UTF-8"))
    // put-if-absent: a POSIX rename REPLACES an existing target, so the
    // atomic no-clobber primitive is link(2) — createLink fails with
    // EEXIST iff another writer committed this version first
    try Files.createLink(manifestPath(path, v), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"snapshot v$v was committed concurrently at $path — retry the merge")
    } finally Files.deleteIfExists(tmp)
  }

  /** Scan a staged data dir and return its (bucket, relative file) entries. */
  private def listVersionFiles(path: String, dirName: String): Seq[(Int, String)] = {
    val vdir = Paths.get(path, "data", dirName)
    Files.list(vdir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("__bucket="))
      .flatMap { bdir =>
        val b = bdir.getFileName.toString.stripPrefix("__bucket=").toInt
        Files.list(bdir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => (b, s"$dirName/__bucket=$b/${f.getFileName}"))
      }.toSeq
  }

  private def writeVersionData(df: DataFrame, path: String, dirName: String): Unit =
    df.write.mode("errorifexists").partitionBy("__bucket")
      .parquet(Paths.get(path, "data", dirName).toString)

  /** Create snapshot v0 from `df`, bucketed by `key`. */
  def init(df: DataFrame, path: String, key: String, nBuckets: Int): Unit = {
    require(currentVersion(path) == -1, s"$path already holds a TxStore")
    writeVersionData(df.withColumn("__bucket", bucketOf(col(key), nBuckets)), path, "v0")
    commitManifest(path, 0, nBuckets, listVersionFiles(path, "v0"))
  }

  /** Read a snapshot (default: current). Files are grouped by their version
    * dir so the partition column recovers from the directory layout; a
    * compacted table reads as a handful of groups. */
  def read(spark: SparkSession, path: String, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(path))
    require(v >= 0, s"no committed snapshot at $path")
    val (_, entries) = readManifest(path, v)
    val byVdir = entries.groupBy(_._2.split("/", 2)(0))
    byVdir.toSeq.sortBy(_._1).map { case (vdir, es) =>
      spark.read
        .option("basePath", Paths.get(path, "data", vdir).toString)
        .parquet(es.map(e => Paths.get(path, "data", e._2).toString): _*)
    }.reduce(_ unionByName _).drop("__bucket")
  }

  /** Copy-on-write MERGE: upsert `delta` (unique per `key`, delta wins) into
    * a snapshot. Only buckets containing delta keys are read and rewritten;
    * every untouched bucket re-enters the new manifest by reference.
    * Returns the committed version.
    *
    * `expectedVersion` pins the snapshot the delta was derived from
    * (compare-and-swap): the commit targets `expected + 1` and FAILS with
    * ConcurrentModificationException if another writer committed that
    * version first — the caller re-reads and re-merges. Omitted, the merge
    * bases on whatever is current at entry (last-writer-wins upsert). */
  def merge(spark: SparkSession, path: String, delta: DataFrame, key: String,
      expectedVersion: Option[Int] = None): Int = {
    val v = expectedVersion.getOrElse(currentVersion(path))
    require(v >= 0, s"no committed snapshot at $path — init first")
    val (nBuckets, entries) = readManifest(path, v)
    val d = delta.withColumn("__bucket", bucketOf(col(key), nBuckets))
      .localCheckpoint() // one materialization: bucket list + join input
    val touched = d.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSet // bounded by nBuckets — metadata scale
    if (touched.isEmpty) return v
    val (touchedEntries, untouchedEntries) = entries.partition(e => touched(e._1))
    // read ONLY the touched buckets' current rows
    val base =
      if (touchedEntries.isEmpty) d.limit(0).drop("__bucket")
      else {
        val byVdir = touchedEntries.groupBy(_._2.split("/", 2)(0))
        byVdir.toSeq.sortBy(_._1).map { case (vdir, es) =>
          spark.read
            .option("basePath", Paths.get(path, "data", vdir).toString)
            .parquet(es.map(e => Paths.get(path, "data", e._2).toString): _*)
        }.reduce(_ unionByName _).drop("__bucket")
      }
    val merged = base
      .join(d.select(col(key)), Seq(key), "left_anti")
      .unionByName(d.drop("__bucket"))
      .withColumn("__bucket", bucketOf(col(key), nBuckets))
    val nv = v + 1
    // stage under a writer-unique dir name: two racing writers can both
    // stage without colliding; only the manifest rename decides the winner
    val dirName = s"v$nv-${java.util.UUID.randomUUID().toString.take(8)}"
    writeVersionData(merged, path, dirName)
    commitManifest(path, nv, nBuckets, listVersionFiles(path, dirName) ++ untouchedEntries)
    nv
  }
}
