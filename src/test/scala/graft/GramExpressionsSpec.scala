package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.llmops.Dedup

/** Pins the two new native expressions against executable definitions:
  *
  *   - [[GraftFunctions.tokenGrams]] ≡ the window-lead shingle build it
  *     replaced: distinct space-joined n-grams, order-insensitive.
  *   - [[GraftFunctions.sortedBagIntersectSize]] ≡ Σ_t min(c_a, c_b) over
  *     token counts (the weighted-Jaccard numerator definition).
  */
class GramExpressionsSpec extends AnyFunSuite with SparkSpec {

  private def refGrams(toks: Seq[String], n: Int): Set[String] =
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet

  test("tokenGrams ≡ sliding-window distinct grams on random token arrays") {
    import spark.implicits._
    val tokGen = Gen.listOfN(3, Gen.oneOf("a", "b", "ab", "ba")).map(_.mkString)
    val arrGen = Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, tokGen))
    val prop = Prop.forAll(Gen.listOfN(8, arrGen), Gen.choose(1, 4)) { (arrs, n) =>
      val df = arrs.zipWithIndex.map { case (a, i) => (i.toLong, a) }
        .toDF("id", "toks")
      val got = df.select(col("id"),
          GraftFunctions.tokenGrams(col("toks"), n).as("g"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1))
      got.forall { case (id, g) =>
        g.toSet == refGrams(arrs(id.toInt), n) && g.distinct.length == g.length
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("tokenGrams drives shingleIndex: equals tokenized sliding grams on text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the cat sat"),
      (2L, "one two"),
      (3L, ""),
      (4L, "solo")).toDF("doc_id", "text")
    val got = Dedup.shingleIndex(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val toks = Map(1L -> "the cat sat on the cat sat", 2L -> "one two",
      3L -> "", 4L -> "solo").view
      .mapValues(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
    val want = toks.flatMap { case (id, t) =>
      refGrams(t, 3).map(id -> _)
    }.toSet
    assert(got == want)
  }

  test("sortedBagIntersectSize ≡ Σ min counts on random bags (incl. empties)") {
    import spark.implicits._
    val tokGen = Gen.oneOf("a", "b", "c", "aa", "ab")
    val bagGen = Gen.choose(0, 15).flatMap(k => Gen.listOfN(k, tokGen))
    val prop = Prop.forAll(Gen.listOfN(6, Gen.zip(bagGen, bagGen))) { pairs =>
      val df = pairs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("id", "a", "b")
      val got = df.select(col("id"), GraftFunctions.sortedBagIntersectSize(
          array_sort(col("a")), array_sort(col("b"))).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      pairs.zipWithIndex.forall { case ((a, b), i) =>
        val ca = a.groupBy(identity).view.mapValues(_.size)
        val cb = b.groupBy(identity).view.mapValues(_.size).toMap
        val want = ca.map { case (t, n) => math.min(n, cb.getOrElse(t, 0)) }.sum
        got(i.toLong) == want.toLong
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
