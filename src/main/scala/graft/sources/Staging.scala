package graft.sources

import org.apache.spark.sql.DataFrame

/** Deterministic micro-batch staging for file-source streams.
  *
  * Structured Streaming's file source orders discovery by modification
  * time; with `maxFilesPerTrigger=1` each staged file becomes one
  * micro-batch. Every streaming-contract query (q53/q63/q95/q112) needs
  * the same recipe — write each part as exactly ONE parquet file, name
  * them in order, stamp fixed strictly-increasing mtimes — so arrival
  * order is part of the test contract, not a filesystem accident. This is
  * the single shared implementation.
  */
object Staging {

  /** Fixed epoch for staged-file mtimes — any constant works; files are
    * spaced one minute apart so ordering is unambiguous on coarse-mtime
    * filesystems. */
  val T0: Long = 1700000000000L

  /** Write each (name, frame) as one parquet file `NN_<name>.parquet`
    * with mtime T0 + NN minutes; returns the staged directory. */
  def stageParts(parts: Seq[(String, DataFrame)]): String = {
    import java.nio.file.{Files, Path}
    val srcDir = Files.createTempDirectory("graft-stage-src")
    parts.zipWithIndex.foreach { case ((name, df), i) =>
      val tmp = Files.createTempDirectory("graft-stage-part")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.toArray.map(_.asInstanceOf[Path])
          .find(_.toString.endsWith(".parquet")).get
        finally listing.close()
      val dst = srcDir.resolve(f"$i%02d_$name.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(T0 + i * 60000L))
    }
    srcDir.toString
  }
}
