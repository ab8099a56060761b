package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, GraftFunctions}

class ArrayDotSpec extends AnyFunSuite with SparkSpec {

  test("arrayDot computes the double dot product under codegen") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),       // 4+10+18 = 32
      (2L, Array(0.5f, -0.5f), Array(2f, 2f)))          // 1 - 1 = 0
      .toDF("id", "a", "b")
    val out = df.select($"id", GraftFunctions.arrayDot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 32.0, 2L -> 0.0))
  }

  test("arrayDotScaled matches the portable quantization formula exactly") {
    import spark.implicits._
    val df = Seq((1L, Array(0.1f, -0.25f), Array(0.3f, 0.5f))).toDF("id", "a", "b")
    val got = df.select(GraftFunctions.arrayDotScaled($"a", $"b", 100000000L))
      .head().getLong(0)
    def q(f: Float): Long = {
      val xd = f.toDouble
      (math.signum(xd) * math.floor(math.abs(xd) * 1e8 + 0.5)).toLong
    }
    val want = q(0.1f) * q(0.3f) + q(-0.25f) * q(0.5f)
    assert(got == want)
  }

  test("null arrays yield null; empty arrays yield zero") {
    import spark.implicits._
    val df = Seq((1L, Some(Array.empty[Float]), Some(Array.empty[Float])),
      (2L, None, Some(Array(1f)))).toDF("id", "a", "b")
    val rows = df.select($"id", GraftFunctions.arrayDot($"a", $"b").as("d"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) == 0.0)
    assert(rows(1).isNullAt(1))
  }

  test("dimension mismatch raises instead of silently truncating") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 2f, 3f), Array(1f, 2f))).toDF("id", "a", "b")
    val e = intercept[Throwable] {
      df.select(GraftFunctions.arrayDot($"a", $"b")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("dimension mismatch")), messages(e).mkString(" | "))
  }

  test("SQL surface: array_dot / array_dot_scaled registered on the session") {
    // extensions (GraftExtensions) only apply at session build time; the
    // runtime registrar covers already-running sessions like this one
    org.apache.spark.sql.graft.Bridge.registerSql(spark)
    val r = spark.sql("SELECT array_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(r == 11.0)
    val s = spark.sql("SELECT array_dot_scaled(array(CAST(0.5 AS FLOAT)), " +
      "array(CAST(0.5 AS FLOAT))) AS d").head().getLong(0)
    assert(s == 50000000L * 50000000L)
  }

  test("agrees with the exploded-sum reference shape on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec")).limit(20)
    val fused = e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        GraftFunctions.arrayDot(col("a.vec"), col("b.vec")).as("d"))
    val exploded = {
      val t = e.select(col("id"), posexplode(col("vec")).as(Seq("p", "x")))
      t.as("a").join(t.as("b"), col("a.p") === col("b.p") && col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id"))
        .agg(sum(col("a.x").cast("double") * col("b.x").cast("double")).as("d"))
    }
    val f = fused.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val x = exploded.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(f.keySet == x.keySet)
    f.foreach { case (k, v) => assert(math.abs(v - x(k)) < 1e-9, s"pair $k") }
  }

  test("planeDots matches an independent reference and signs match hyperplaneSig") {
    import spark.implicits._
    val dim = 8
    val planes = 6
    val scale = 1000000L
    // deterministic but non-trivial vectors
    val vecs = (0 until 4).map { k =>
      (k.toLong, Array.tabulate(dim)(j => ((k * 31 + j * 7) % 11 - 5) / 4.0f))
    }
    val df = vecs.toDF("id", "vec")
    val got = df.select($"id",
        GraftFunctions.planeDots($"vec", planes, dim, scale).as("pd"),
        GraftFunctions.hyperplaneSig($"vec", planes, dim, scale).as("sg"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toList
    def q(f: Float): Long = {
      val xd = f.toDouble
      (math.signum(xd) * math.floor(math.abs(xd) * scale + 0.5)).toLong
    }
    def sgn(i: Int, j: Int): Long =
      if ((((2654435761L * (i.toLong * dim + j) + 40503L) % 4294967296L) >> 16 & 1L) == 0L) -1L else 1L
    got.foreach { case (id, pd, sg) =>
      val v = vecs(id.toInt)._2
      val want = (0 until planes).map(i => (0 until dim).map(j => q(v(j)) * sgn(i, j)).sum)
      assert(pd == want, s"vector $id")
      // bit i of the signature is exactly sign(coord_i) — the q105/q125 contract
      (0 until planes).foreach { i =>
        assert(((sg >> i & 1L) == 1L) == (pd(i) > 0L), s"vector $id plane $i")
      }
    }
  }
}
