package graft

import org.apache.spark.sql.graft.{ArgminCell, Bridge, PqAdcScore, PqAdcTables, PqEncode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native PQ quantization expressions: interpreted and codegen paths both
  * covered (the `local[4]` runs compile generated code; a collect on a
  * literal frame exercises it end to end). */
class PqExpressionsSpec extends AnyFunSuite with SparkSpec {

  private val coarse = Array(Array(0.0, 0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0, 1.0))
  // m=2 subspaces × ksub=2 centroids × subDim=2
  private val books = Array(
    Array(Array(0.0, 0.0), Array(0.5, 0.5)),
    Array(Array(-0.5, -0.5), Array(0.0, 0.0)))

  test("ArgminCell: picks the nearest coarse centroid, ties to lowest id") {
    import spark.implicits._
    val df = Seq(
      Tuple1(Array(0.1f, 0.1f, 0.0f, 0.0f)),  // near centroid 0
      Tuple1(Array(0.9f, 1.0f, 1.1f, 1.0f)),  // near centroid 1
      Tuple1(Array(0.5f, 0.5f, 0.5f, 0.5f))   // equidistant → 0
    ).toDF("vec")
    val got = df.select(Bridge.column(
      ArgminCell(Bridge.expression($"vec"), coarse)).as("c"))
      .collect().map(_.getInt(0))
    assert(got.sameElements(Array(0, 1, 0)))
  }

  test("PqEncode: matches brute-force residual encoding") {
    import spark.implicits._
    // vector in cell 1: residual = v − (1,1,1,1)
    val v = Array(1.4f, 1.6f, 0.6f, 0.4f) // residual (0.4,0.6,−0.4,−0.6)
    // sub 0 residual (0.4,0.6): dist to (0,0)=0.52, to (0.5,0.5)=0.02 → code 1
    // sub 1 residual (−0.4,−0.6): to (−0.5,−0.5)=0.02, to (0,0)=0.52 → code 0
    val got = Seq((v, 1)).toDF("vec", "cell")
      .select(Bridge.column(PqEncode(Bridge.expression($"vec"),
        Bridge.expression($"cell"), coarse, books)).as("codes"))
      .collect().head.getSeq[Int](0)
    assert(got == Seq(1, 0))
  }

  test("PqAdcTables + PqAdcScore: reconstruct the sub-dot sum") {
    import spark.implicits._
    val q = Array(1.0f, 2.0f, 3.0f, 4.0f)
    val df = Seq((q, Seq(1, 0))).toDF("vec", "codes")
      .select(Bridge.column(PqAdcTables(Bridge.expression($"vec"), books)).as("tabs"),
        $"codes")
    val tabs = df.collect().head.getSeq[Seq[Double]](0)
    // tabs[0] = dots of (1,2) with books(0): [0, 1.5]; tabs[1] of (3,4): [−3.5, 0]
    assert(tabs == Seq(Seq(0.0, 1.5), Seq(-3.5, 0.0)))
    val score = df.select(Bridge.column(PqAdcScore(
        Bridge.expression($"tabs"), Bridge.expression($"codes"))).as("s"))
      .collect().head.getDouble(0)
    assert(score == 1.5 + -3.5) // tabs[0][1] + tabs[1][0]
  }

  test("dimension mismatch raises instead of silently truncating") {
    import spark.implicits._
    val bad = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("vec")
    val err = intercept[Exception] {
      bad.select(Bridge.column(
        ArgminCell(Bridge.expression($"vec"), coarse))).collect()
    }
    assert(err.getMessage != null)
  }
}
