package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.policy._

/** Stock policy semantics + serde — mirrors
  * `src/test/java/org/kiji/scoring/lib/TestShelfLife.java:96-123` and
  * `src/test/java/org/kiji/scoring/lib/TestNewerThan.java:97-121`. */
class PolicySpec extends AnyFunSuite with SparkSpec {

  /** Evaluate a policy against a single cell with one version at `ts`. */
  private def fresh(p: FreshnessPolicy, ts: Long, asOf: Long): Boolean = {
    import spark.implicits._
    Seq(("e", Seq(ts))).toDF("entity_id", "c")
      .withColumn("c", expr("transform(c, t -> named_struct('ts', t, 'value', 'v'))"))
      .select(p.isFresh(col("c"), asOf).as("f")).head().getBoolean(0)
  }

  private def freshEmpty(p: FreshnessPolicy, asOf: Long): Boolean = {
    import spark.implicits._
    Seq(("e", Seq.empty[Long])).toDF("entity_id", "c")
      .withColumn("c", expr("transform(c, t -> named_struct('ts', t, 'value', 'v'))"))
      .select(p.isFresh(col("c"), asOf).as("f")).head().getBoolean(0)
  }

  test("AlwaysFreshen is never fresh; NeverFreshen is always fresh") {
    assert(!fresh(new AlwaysFreshen, 5L, 10L))
    assert(fresh(new NeverFreshen, 5L, 10L))
  }

  test("ShelfLife: fresh iff newest ts within shelf life of asOf; empty cell is stale") {
    val p = new ShelfLife(10L)
    assert(fresh(p, 5L, 10L))    // age 5 <= 10
    assert(fresh(p, 5L, 15L))    // age 10 <= 10 (boundary)
    assert(!fresh(p, 5L, 16L))   // age 11 > 10
    assert(!freshEmpty(p, 10L))  // no values => stale (ShelfLife.java:83-91)
  }

  test("NewerThan: fresh iff newest ts >= threshold; flips at 1 vs 10 against ts=5") {
    assert(fresh(new NewerThan(1L), 5L, 99L))
    assert(!fresh(new NewerThan(10L), 5L, 99L))
    assert(fresh(new NewerThan(5L), 5L, 99L)) // boundary inclusive
    assert(!freshEmpty(new NewerThan(1L), 99L))
  }

  test("serde round-trip (property): ShelfLife / NewerThan state") {
    val prop = Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { v =>
      val s2 = new ShelfLife(); s2.deserialize(new ShelfLife(v).serialize())
      val n2 = new NewerThan(); n2.deserialize(new NewerThan(v).serialize())
      s2.shelfLifeMs == v && n2.newerThanMs == v
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("reflective load by class name restores state") {
    val p = FreshnessPolicy.load(classOf[ShelfLife].getName, """{"shelfLife":86400000}""")
    assert(p.asInstanceOf[ShelfLife].shelfLifeMs == 86400000L)
  }

  test("bad state fails to deserialize") {
    intercept[IllegalArgumentException](new ShelfLife().deserialize("garbage"))
  }
}
