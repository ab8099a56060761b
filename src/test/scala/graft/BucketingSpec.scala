package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Co-located joins via bucketing: both sides bucketed+sorted on the join
  * key ⇒ the sort-merge join plans with no shuffle exchange. */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed equi-join plans without a shuffle exchange") {
    val dir = Files.createTempDirectory("graft-buckets").toString
    val sf = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")

    Bucketing.writeBucketed(orders, "b_orders", s"$dir/orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", s"$dir/lineitem", "o_orderkey", 4)

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), "o_orderkey")
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    assert(!Bucketing.hasShuffle(joined),
      "bucketed join should not shuffle:\n" + joined.queryExecution.executedPlan)

    // same join unbucketed DOES shuffle — the exchange bucketing removes
    val plain = orders.join(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    assert(Bucketing.hasShuffle(plain))

    // and the results agree
    assert(joined.agg(sum("n")).head.getLong(0) == plain.agg(sum("n")).head.getLong(0))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("q45 declared query: the co-located join plans with no hash-partition exchange") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Relational.q45BucketedJoin(spark, sf).collect()
    assert(out.nonEmpty && out.map(_.getLong(1)).sum > 0)
    val joinOnly = graft.queries.Relational.bucketedOrderJoin(
      spark, graft.queries.Relational.bucketedTag(sf))
    assert(!Bucketing.hasShuffle(joinOnly),
      "q45 join inputs must be exchange-free:\n" + joinOnly.queryExecution.executedPlan)
  }

  test("saltedJoin spreads hot keys and matches the plain join") {
    import spark.implicits._
    import graft.engine.Skew
    // one pathologically hot key (90% of rows) + a tail
    val big = ((1 to 900).map(i => (42L, s"v$i")) ++ (1 to 100).map(i => (i.toLong, s"t$i")))
      .toDF("k", "payload")
    val small = Seq((42L, "hot"), (7L, "seven"), (99L, "ninetynine")).toDF("k", "label")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
    val plain = big.join(small, "k")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum(length(col("payload") ) + length(col("label")))).head.getLong(0)
      == plain.agg(sum(length(col("payload")) + length(col("label")))).head.getLong(0))
    // the hot key's rows really are spread over multiple salt values
    val spread = big.filter($"k" === 42L)
      .withColumn("s", pmod(xxhash64(big.columns.map(col): _*), lit(8)))
      .select("s").distinct().count()
    assert(spread > 1)
  }

  test("writeBack with partitionBy produces a partition-pruned layout") {
    import graft.engine.FreshReader
    import graft.model.{ColumnName, DataRequest}
    import graft.policy.ShelfLife
    import graft.registry.FreshnessManager
    val user = Fixtures.userCounter(spark).withColumn("shard", col("entity_id").substr(1, 1))
    val m = new FreshnessManager(n => Some(user.schema))
    m.storePolicy("user", ColumnName("info:visits"),
      classOf[VisitsIncrement].getName, new ShelfLife(86400000L))
    val r = FreshReader.builder(m).withTable("user", user).withAsOf(86400002L).build()
    val out = Files.createTempDirectory("graft-partby").toString + "/user"
    r.writeBack(DataRequest(Seq(ColumnName("info:visits"))), out, partitionBy = Seq("shard"))
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("shard=")))
    val pruned = spark.read.parquet(out).filter(col("shard") === "f")
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(shard"))
    assert(pruned.count() == 1)
  }

  test("writeZordered: every output file covers a tight (x, y) rectangle") {
    import spark.implicits._
    // 64×64 grid into 16 z-ordered files: perfect z-clustering gives 16×16
    // rectangles (span 15); allow range-sampling slack up to span 31 —
    // either way FAR tighter than the 63-span files an x-sorted or random
    // layout produces on at least one axis
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val out = Files.createTempDirectory("graft-zorder").toString + "/grid"
    graft.sources.Bucketing.writeZordered(grid, out, "x", "y", files = 16)
    val xr = graft.sources.Bucketing.fileRanges(spark, out, "x")
    val yr = graft.sources.Bucketing.fileRanges(spark, out, "y")
    assert(xr.nonEmpty && xr.size >= 8)
    assert(xr.forall { case (lo, hi) => hi - lo <= 31 },
      s"x spans too wide: $xr")
    assert(yr.forall { case (lo, hi) => hi - lo <= 31 },
      s"y spans too wide: $yr")
    // the point of the layout: a range predicate on EITHER column keeps only
    // a fraction of the files
    val keptX = xr.count { case (lo, hi) => hi >= 0 && lo <= 15 }
    val keptY = yr.count { case (lo, hi) => hi >= 0 && lo <= 15 }
    assert(keptX < xr.size && keptY < yr.size,
      s"no file pruning: x $keptX/${xr.size}, y $keptY/${yr.size}")
    // answer unchanged
    assert(spark.read.parquet(out).count() == 64 * 64)
  }
}
