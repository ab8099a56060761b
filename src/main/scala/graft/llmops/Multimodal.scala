package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads are opaque `BinaryType`
  * columns travelling with a typed metadata struct; decode/feature-extract
  * run partition-parallel over the bytes.
  *
  * The decode step is STUBBED (this environment ships no image/audio
  * codecs): [[fakeDecodeFeatures]] derives deterministic pseudo-features
  * from the payload bytes so the Spark-side plumbing — schema, batch
  * iteration, partition parallelism, output shape — is real and tested.
  * Swap `decodeStub` for a codec-backed implementation in production.
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

  /** The decode stub: a real implementation would decode the payload with a
    * codec and emit features. Here: deterministic pseudo-features — feature
    * j = (byte[j mod n] & 0xFF) / 255.0 — so shape and plumbing are
    * exercised end-to-end. */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim) { j =>
      if (payload == null || payload.isEmpty) 0f // schema allows null payloads
      else (payload(j % payload.length) & 0xff) / 255f
    }

  /** Partition-parallel feature extraction over media payloads: the Spark
    * analogue of a Pandas-UDF/mapInPandas decode stage. Returns
    * (media_id, features ARRAY<FLOAT>). */
  def fakeDecodeFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // codec init would happen here, once per partition
        rows.map { r =>
          Row(r.getLong(0), decodeStub(r.getAs[Array[Byte]](1), dim).toSeq)
        }
      }(enc)
  }
}
