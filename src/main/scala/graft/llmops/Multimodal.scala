package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads are opaque `BinaryType`
  * columns travelling with a typed metadata struct; decode/feature-extract
  * run partition-parallel over the bytes.
  *
  * Decoding is pluggable ([[Multimodal.MediaDecoder]], built once per
  * partition): [[Multimodal.ImageIoDecoder]] is a REAL image decoder over
  * the JDK's javax.imageio (PNG/JPEG/BMP/GIF, no external dependency);
  * [[Multimodal.StubDecoder]] derives deterministic pseudo-features from
  * the payload bytes and backs the oracle-checked q30 (the synthetic
  * corpus carries text payloads, and byte arithmetic is reproducible in
  * SQL). Audio/video codecs would slot in the same way.
  *
  * Scale: content addressing (SHA-256) happens in the scan stage; frame
  * chunking is a generator expression (no shuffle); feature extraction is
  * `mapPartitions` so codec initialization amortizes per partition, the
  * standard pattern for Python/JNI decoders at 100 TB.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("sha256", StringType))))))

  /** Wrap a text table as a binary media table (payload = UTF-8 bytes) with
    * content-addressed metadata. In production the payload column comes
    * straight from the source (image bytes etc.); nothing downstream assumes
    * it is text. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String,
      mime: String = "text/plain"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit(mime).as("mime"),
        octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        sha2(col(textCol).cast("binary"), 256).as("sha256")).as("meta"))

  /** Frame/chunk sampling: split the payload into fixed-size byte frames and
    * content-hash each. Generator expression — one output row per frame, no
    * shuffle, no driver work. */
  def frames(media: DataFrame, frameBytes: Int): DataFrame =
    media.select(
        col("media_id"),
        col("meta"),
        // empty payloads emit ZERO frames (explode of the empty array drops
        // the row) — `div` truncates toward zero, so (0-1) div f would
        // otherwise fabricate a phantom frame where floor semantics
        // (and the oracle) produce none
        explode(when(col("meta.n_bytes") > 0,
          sequence(lit(0L), expr(s"(meta.n_bytes - 1) div $frameBytes")))
          .otherwise(array().cast("array<bigint>"))).as("frame_idx"),
        col("payload"))
      .select(
        col("media_id"),
        col("frame_idx"),
        substring(col("payload"), (col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes)).as("frame"))
      .withColumn("frame_bytes", octet_length(col("frame")).cast("long"))
      .withColumn("frame_sha", sha2(col("frame"), 256))

  /** Cross-media duplicated-frame coverage — content-defined chunk dedup
    * for binary payloads (the storage-dedupe / media analogue of
    * [[Dedup.dupSpanCoverage]]): a frame is duplicated when its content
    * hash also appears in at least one OTHER media object; per media the
    * operator reports how many of its frames are cross-media duplicates.
    * Repetition within one payload does not count.
    *
    * Scale: frames never shuffle their bytes — document frequency and the
    * coverage join key on the 64-hex frame digest; everything else is
    * per-media aggregation. Returns (media_id, n_frames, n_dup_frames,
    * dup_permille). */
  def frameDupCoverage(media: DataFrame, frameBytes: Int): DataFrame = {
    val fr = frames(media, frameBytes).select("media_id", "frame_idx", "frame_sha")
    val fdf = fr.select("media_id", "frame_sha").distinct()
      .groupBy("frame_sha").agg(count(lit(1)).as("fdf"))
    val dup = fr.join(fdf.filter(col("fdf") >= 2).select("frame_sha"), "frame_sha")
      .groupBy("media_id").agg(count(lit(1)).as("n_dup_frames"))
    fr.groupBy("media_id").agg(count(lit(1)).as("n_frames"))
      .join(dup, Seq("media_id"), "left")
      .withColumn("n_dup_frames", coalesce(col("n_dup_frames"), lit(0L)))
      .withColumn("dup_permille", expr("(n_dup_frames * 1000) div n_frames"))
  }

  /** Pluggable payload→features decoder. Instances are created PER
    * PARTITION from a serializable factory (see [[decodeFeatures]]) so
    * codec/library initialization amortizes across a partition's rows —
    * the JNI/Pandas-UDF pattern for 100 TB media pipelines. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic stub decoder — feature j = (byte[j mod n] & 0xFF)/255.0.
    * Used by the ORACLE-CHECKED q30 (byte arithmetic is reproducible in
    * SQL); swap in [[ImageIoDecoder]] (real codec) for image payloads. */
  final class StubDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte], dim: Int): Array[Float] =
      Array.tabulate(dim) { j =>
        if (payload == null || payload.isEmpty) 0f // schema allows null payloads
        else (payload(j % payload.length) & 0xff) / 255f
      }
  }

  /** REAL image decode via the JDK's javax.imageio (PNG/JPEG/BMP/GIF — no
    * external dependency): features = `dim`-bucket luminance histogram,
    * normalized by pixel count (deterministic: integer luminance
    * bucketing, no float accumulation until the final divide).
    * Null/unreadable payloads yield all-zero features rather than failing
    * the job — at 100 TB some corrupt blobs are a certainty. */
  final class ImageIoDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      if (payload == null || payload.isEmpty) return new Array[Float](dim)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null || img.getWidth == 0 || img.getHeight == 0)
        return new Array[Float](dim)
      val hist = new Array[Long](dim)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum * dim / 256) += 1
          x += 1
        }
        y += 1
      }
      val n = img.getWidth.toLong * img.getHeight
      hist.map(c => c.toFloat / n)
    }
  }

  /** Partition-parallel feature extraction over media payloads: the Spark
    * analogue of a Pandas-UDF/mapInPandas decode stage. The decoder is
    * constructed once per partition from `newDecoder`. Returns
    * (media_id, features ARRAY<FLOAT>). */
  def decodeFeatures(media: DataFrame, dim: Int,
      newDecoder: () => MediaDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        val decoder = newDecoder() // codec init, once per partition
        rows.map { r =>
          Row(r.getLong(0), decoder.decode(r.getAs[Array[Byte]](1), dim).toSeq)
        }
      }(enc)
  }

  /** Stub-decoder convenience used by the oracle-checked q30. */
  def fakeDecodeFeatures(media: DataFrame, dim: Int = 8): DataFrame =
    decodeFeatures(media, dim, () => new StubDecoder)

  /** Cross-media duplicated-chunk coverage with CONTENT-DEFINED boundaries
    * ([[graft.functions.GraftFunctions.cdcChunks]] — the rsync/LBFS
    * rolling-hash cut): the insertion-robust form of [[frameDupCoverage]].
    * A fixed 64-byte frame grid loses all dedup signal past any edit
    * (every downstream frame shifts); CDC boundaries depend only on local
    * content, so a mirrored payload with an inserted banner still shares
    * every chunk outside the edit neighborhood.
    *
    * Scale: chunking is one native codegen'd loop in the scan stage (no
    * explode-then-window, no shuffle of payload bytes); everything after
    * is the q98 shape — document frequency and the coverage join key on
    * the chunk digest. Returns (media_id, n_chunks, n_dup_chunks,
    * dup_permille); empty payloads emit zero chunks and drop out, exactly
    * like [[frameDupCoverage]]. */
  def cdcDupCoverage(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 8, div: Int = 64): DataFrame = {
    import graft.functions.GraftFunctions.cdcChunks
    val ck = docs.select(col(idCol).as("media_id"),
        explode(cdcChunks(col(textCol), window, div)).as("chunk"))
      .select(col("media_id"), md5(col("chunk")).as("g"))
    val fdf = ck.select("media_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("fdf"))
    val dup = ck.join(fdf.filter(col("fdf") >= 2).select("g"), "g")
      .groupBy("media_id").agg(count(lit(1)).as("n_dup_chunks"))
    ck.groupBy("media_id").agg(count(lit(1)).as("n_chunks"))
      .join(dup, Seq("media_id"), "left")
      .withColumn("n_dup_chunks", coalesce(col("n_dup_chunks"), lit(0L)))
      .withColumn("dup_permille", expr("(n_dup_chunks * 1000) div n_chunks"))
  }

  /** Media-pair near-dup: Jaccard over each item's DISTINCT frame-hash set
    * — the video/asset-level duplicate detector ("these two videos share
    * most of their frames") complementing [[frameDupCoverage]]'s per-item
    * coverage report. A re-encoded copy with a changed header or appended
    * trailer keeps most frame hashes, so pairs surface at high Jaccard
    * where whole-payload SHA equality (exact dedup) misses them.
    *
    * Candidates come from the inverted frame-hash index (pairs sharing ≥1
    * frame — an equi-join on the digest, never all-pairs). A frame whose
    * hash appears in many items fans out quadratically; `maxFrameDocFreq`
    * (LOSSY, the [[Dedup.jaccardPairs]] knob) drops such stop-frames from
    * candidate generation — a pair whose ONLY shared frames are stop-frames
    * is missed; set sizes and the Jaccard stay computed over full sets.
    *
    * Returns (id_a, id_b, n_inter, n_a, n_b, jaccard) with id_a < id_b and
    * jaccard ≥ minJaccard. */
  def frameJaccardPairs(media: DataFrame, frameBytes: Int, minJaccard: Double,
      maxFrameDocFreq: Option[Int] = None): DataFrame = {
    val sets = frames(media, frameBytes)
      .select(col("media_id").as("id"), col("frame_sha").as("g"))
      .distinct()
      .persist() // candidate index + sizes share one chunk+hash pass; caller unpersists
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("n_fr"))
    def score(pairCounts: DataFrame): DataFrame = pairCounts
      .join(sizes.select(col("id").as("id_a"), col("n_fr").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_fr").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
    maxFrameDocFreq match {
      case None =>
        // uncapped: the inverted-index join IS the full intersection count
        score(sets.as("a")
          .join(sets.as("b"), col("a.g") === col("b.g") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("n_inter")))
      case Some(c) =>
        // capped: stop-frames bound CANDIDATE generation only; survivors
        // rescore with one fused array_intersect over the FULL hash sets,
        // so n_inter/jaccard are exact (only recall is lossy)
        val fdf = sets.groupBy("g").agg(count(lit(1)).as("fdf"))
        val candIdx = sets.join(fdf.filter(col("fdf") <= c).select("g"), "g")
        val cand = candIdx.as("a")
          .join(candIdx.as("b"), col("a.g") === col("b.g") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct()
        val full = sets.groupBy("id").agg(sort_array(collect_list(col("g"))).as("gs"))
        score(cand
          .join(full.select(col("id").as("id_a"), col("gs").as("gs_a")), "id_a")
          .join(full.select(col("id").as("id_b"), col("gs").as("gs_b")), "id_b")
          .withColumn("n_inter",
            size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
          .select("id_a", "id_b", "n_inter"))
    }
  }

  /** Perceptual-hash (aHash) media near-dup — the third media dedup
    * signal, orthogonal to [[frameJaccardPairs]] (shared content blocks)
    * and [[cdcDupCoverage]] (insertion-robust chunks): a 64-bit
    * AVERAGE-HASH of each item's decoded pixels (here the deterministic
    * fake decode: byte j of the payload at j mod n — the q30 convention),
    * bit j = pixel_j >= floor-mean. Global brightness/contrast shifts
    * preserve the sign pattern, so re-encoded copies land within a few
    * bits. Stored as two 32-bit words; candidate pairs share at least one
    * EXACT word (two-band Hamming LSH). The banding guarantee is
    * therefore only Hamming ≤ 1 by pigeonhole (a single flip leaves the
    * other word identical); any pair with ≥ 1 flip in EACH half is
    * missed regardless of total distance — the standard lossy banding
    * trade, stated like q105/q144. The exact XOR-popcount rescore then
    * keeps surviving candidates at Hamming <= `maxHamming`, so every
    * SURFACED pair is true. A hot identical word fans out
    * quadratically at corpus scale; cap it with a stop-band df filter
    * like q144's stop-frame knob when deploying wide.
    *
    * Returns (id_a, id_b, hamming), id_a < id_b. */
  def aHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val h = docs
      .filter(length(col(textCol)) > 0)
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("px", expr(
        "transform(sequence(0, 63), j -> CAST(ascii(substr(t, " +
          "CAST(j % length(t) AS INT) + 1, 1)) AS BIGINT))"))
      .withColumn("mean",
        expr("aggregate(px, CAST(0 AS BIGINT), (a, e) -> a + e) div 64"))
      .withColumn("h_lo", expr(
        "aggregate(sequence(0, 31), CAST(0 AS BIGINT), (a, j) -> " +
          "a + IF(element_at(px, CAST(j AS INT) + 1) >= mean, " +
          "shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)), CAST(0 AS BIGINT)))"))
      .withColumn("h_hi", expr(
        "aggregate(sequence(32, 63), CAST(0 AS BIGINT), (a, j) -> " +
          "a + IF(element_at(px, CAST(j AS INT) + 1) >= mean, " +
          "shiftleft(CAST(1 AS BIGINT), CAST(j AS INT) - 32), CAST(0 AS BIGINT)))"))
      .select("id", "h_lo", "h_hi")
      .persist() // feeds both band joins + the rescore; caller unpersists
    val byLo = h.as("a").join(h.as("b"),
        col("a.h_lo") === col("b.h_lo") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val byHi = h.as("a").join(h.as("b"),
        col("a.h_hi") === col("b.h_hi") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    byLo.union(byHi).distinct()
      .join(h.select(col("id").as("id_a"), col("h_lo").as("lo_a"), col("h_hi").as("hi_a")), "id_a")
      .join(h.select(col("id").as("id_b"), col("h_lo").as("lo_b"), col("h_hi").as("hi_b")), "id_b")
      .withColumn("hamming", expr(
        "CAST(bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
