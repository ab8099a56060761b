package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.JaroWinklerImpl
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the native Jaro–Winkler comparator: textbook values, the
  * DuckDB empty-string convention, algebraic invariants under fuzz, and
  * codegen ≡ interpreted (the DataFrame path calls the generated code;
  * JaroWinklerImpl is the interpreted scalar — they must agree on every
  * pair). Cross-ENGINE parity with DuckDB's jaro_winkler_similarity is
  * the q317 oracle gate itself (plus the offline 3,000-pair fuzz recorded
  * in the expression's scaladoc). */
class JaroWinklerSpec extends AnyFunSuite with SparkSpec {

  test("textbook pairs quantize to the published values") {
    assert(JaroWinklerImpl.jwPpm("martha", "marhta") == 961111L)
    assert(JaroWinklerImpl.jwPpm("dixon", "dicksonx") == 813333L)
    assert(JaroWinklerImpl.jwPpm("jellyfish", "smellyfish") == 896296L)
    assert(JaroWinklerImpl.jwPpm("dwayne", "duane") == 840000L)
    // below the 0.7 boost threshold: pure Jaro, no prefix bonus
    assert(JaroWinklerImpl.jwPpm("crate", "trace") == 733333L)
  }

  test("DuckDB empty-string convention: any empty side is 0, equality is 1e6") {
    assert(JaroWinklerImpl.jwPpm("", "") == 0L)
    assert(JaroWinklerImpl.jwPpm("abc", "") == 0L)
    assert(JaroWinklerImpl.jwPpm("", "abc") == 0L)
    assert(JaroWinklerImpl.jwPpm("a", "a") == 1000000L)
    assert(JaroWinklerImpl.jwPpm("a", "b") == 0L)
  }

  private val genStr: Gen[String] = for {
    n <- Gen.choose(0, 14)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', ' '))
  } yield cs.mkString

  test("property: symmetric, bounded, reflexive (non-empty), prefix-monotone boost") {
    val prop = Prop.forAll(genStr, genStr) { (a, b) =>
      val ab = JaroWinklerImpl.jwPpm(a, b)
      val ba = JaroWinklerImpl.jwPpm(b, a)
      val refl = a.isEmpty || JaroWinklerImpl.jwPpm(a, a) == 1000000L
      ab == ba && ab >= 0L && ab <= 1000000L && refl
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("codegen path (DataFrame) equals the interpreted scalar on part-name pairs") {
    import spark.implicits._
    val names = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select("p_name").collect().map(_.getString(0)).take(40)
    val pairs = for (a <- names; b <- names) yield (a, b)
    val got = pairs.toSeq.toDF("a", "b")
      .select(graft.functions.GraftFunctions.jaroWinklerPpm(col("a"), col("b")).as("jw"))
      .collect().map(_.getLong(0))
    val want = pairs.map { case (a, b) => JaroWinklerImpl.jwPpm(a, b) }
    assert(got.sameElements(want))
  }
}
