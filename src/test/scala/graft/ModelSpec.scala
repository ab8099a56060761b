package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Cells, ColumnName, DataRequest}

class ModelSpec extends AnyFunSuite with SparkSpec {

  test("ColumnName parses family and qualified forms") {
    assert(ColumnName("info:visits") == ColumnName("info", Some("visits")))
    assert(ColumnName("info:visits").isFullyQualified)
    assert(ColumnName("info:visits").flat == "info_visits")
    assert(ColumnName("networks") == ColumnName("networks", None))
    assert(!ColumnName("networks").isFullyQualified)
    assert(ColumnName("info:visits").toString == "info:visits")
  }

  test("Cells.newest / hasValues / inRange / latest over a versioned cell") {
    import spark.implicits._
    val df = Seq(
      ("e1", Seq((9L, "v9"), (5L, "v5"), (1L, "v1"))),
      ("e2", Seq.empty[(Long, String)])
    ).toDF("entity_id", "c")
      .withColumn("c", expr("transform(c, x -> named_struct('ts', x._1, 'value', x._2))"))

    val out = df.select(
      col("entity_id"),
      Cells.newestValue(col("c")).as("nv"),
      Cells.newestTs(col("c")).as("nt"),
      Cells.hasValues(col("c")).as("hv"),
      Cells.latest(col("c"), 2).as("l2"),
      Cells.inRange(col("c"), 2L, 9L).as("rng")
    ).orderBy("entity_id").collect()

    val e1 = out(0)
    assert(e1.getString(1) == "v9" && e1.getLong(2) == 9L && e1.getBoolean(3))
    assert(e1.getSeq[Row](4).map(_.getLong(0)) == Seq(9L, 5L))
    assert(e1.getSeq[Row](5).map(_.getLong(0)) == Seq(5L))
    val e2 = out(1)
    assert(!e2.getBoolean(3))
  }

  test("Cells.put keeps newest-first order") {
    import spark.implicits._
    val df = Seq(("e1", Seq((5L, 10L)))).toDF("entity_id", "c")
      .withColumn("c", expr("transform(c, x -> named_struct('ts', x._1, 'value', x._2))"))
    val out = df.select(Cells.put(col("c"), lit(100L), lit(11L)).as("c"))
      .selectExpr("transform(c, x -> x.ts) AS ts", "transform(c, x -> x.value) AS v")
      .head()
    assert(out.getSeq[Long](0) == Seq(100L, 5L))
    assert(out.getSeq[Long](1) == Seq(11L, 10L))
  }

  test("DataRequest.select: version window + map family + qualified-into-map") {
    val df = Fixtures.rowDataTest(spark)
    // whole map family, max 1 version
    val fam = DataRequest(Seq(ColumnName("map"))).select(df)
      .filter(col("entity_id") === "foo")
      .selectExpr("map['qualifier'][0].value AS v").head()
    assert(fam.getInt(0) == 1)
    // qualified into map family
    val qual = DataRequest(Seq(ColumnName("map:qualifier"))).select(df)
    assert(qual.columns.toSeq == Seq("entity_id", "map_qualifier"))
    // group-family column with time range excluding everything
    val ranged = DataRequest(Seq(ColumnName("family:qual0")), timeRange = Some((10L, 20L)))
      .select(df).filter(col("entity_id") === "foo")
      .selectExpr("size(family_qual0)").head()
    assert(ranged.getInt(0) == 0)
    // bare group family expands to every family_* column (whole-family read)
    val fam2 = DataRequest(Seq(ColumnName("family"))).select(df)
    assert(fam2.columns.toSeq ==
      Seq("entity_id", "family_qual0", "family_qual1", "family_qual2"))
  }
}
