package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The events-table loader must yield the IDENTICAL µs-typed frame no
  * matter how the testdata generator encoded `ts` — it has already
  * shipped int64-nanos (TIMESTAMP(NANOS), surfaced as long under
  * `nanosAsLong`) and TIMESTAMP(MICROS) (surfaced as TIMESTAMP or
  * TIMESTAMP_NTZ depending on the footer's isAdjustedToUTC and
  * `inferTimestampNTZ`). The regeneration that flipped the encoding
  * mid-round-7 broke 25 queries at analysis time; this spec pins every
  * branch of [[Tables.loadEvents]] so the next drift is a red test, not
  * a silently-shrunken correctness artifact.
  */
class TablesSpec extends AnyFunSuite with SparkSpec {

  // 2021-03-04 05:06:07.123456789 UTC — nanos exercise the ns→µs floor
  private val baseNanos = 1614834367123456789L
  private val rowsN = 5

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft-tables-spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Canonical rows: (event_id, ts-as-epoch-µs) after loadEvents. */
  private def canon(df: DataFrame): Seq[(Long, Long)] = {
    assert(df.schema("ts").dataType == TimestampType,
      s"loadEvents must normalize ts to TIMESTAMP, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  private val expected: Seq[(Long, Long)] =
    (0 until rowsN).map(i => (i.toLong, (baseNanos + i * 1000000000L) / 1000L))

  test("loadEvents: int64-nanos encoding (TIMESTAMP(NANOS) under nanosAsLong)") {
    import spark.implicits._
    val dir = tmpDir()
    (0 until rowsN).map(i => (i.toLong, baseNanos + i * 1000000000L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(canon(Tables.loadEvents(spark, s"$dir/events.parquet")) == expected)
  }

  test("loadEvents: TIMESTAMP(MICROS) adjusted-to-UTC encoding (reads as TIMESTAMP)") {
    val dir = tmpDir()
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      spark.range(rowsN).selectExpr("id AS event_id",
          s"timestamp_micros(id * 1000000 + ${baseNanos / 1000L}) AS ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally prev.foreach(spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    assert(canon(Tables.loadEvents(spark, s"$dir/events.parquet")) == expected)
  }

  test("loadEvents: TIMESTAMP_NTZ encoding (isAdjustedToUTC=false, the current testdata)") {
    val dir = tmpDir()
    spark.range(rowsN).selectExpr("id AS event_id",
        s"CAST(timestamp_micros(id * 1000000 + ${baseNanos / 1000L}) AS TIMESTAMP_NTZ) AS ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(canon(Tables.loadEvents(spark, s"$dir/events.parquet")) == expected)
  }

  test("loadEvents: all three encodings yield byte-identical frames") {
    // transitivity of the three pins above, stated once against the REAL
    // testdata file so a fourth encoding shows up here first
    val real = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(real.schema("ts").dataType == TimestampType)
    assert(real.limit(1).count() == 1L)
  }

  test("loadEvents: unsupported ts type is a loud analysis-time error") {
    import spark.implicits._
    val dir = tmpDir()
    (0 until rowsN).map(i => (i.toLong, s"2021-03-04T05:06:0$i"))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] {
      Tables.loadEvents(spark, s"$dir/events.parquet")
    }
    assert(e.getMessage.contains("unsupported"))
  }
}
