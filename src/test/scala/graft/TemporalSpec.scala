package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sketches, Temporal}

/** Temporal operators (as-of join, range join) and sketch heavy hitters:
  * hand-pinned small cases plus random-input equivalence against the naive
  * (inequality-join) forms the operators exist to avoid. */
class TemporalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def leftDf(rows: (Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("k", "t", "tag")

  private def rightDf(rows: (Long, Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("k", "t", "rid", "rv")

  test("asofJoin inclusive: equal-time right row is visible; latest wins") {
    val l = leftDf((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
    val r = rightDf((1L, 10L, 100L, "x"), (1L, 15L, 101L, "y"), (2L, 9L, 102L, "z"))
    val out = Temporal.asofJoin(l, r, "k", "t", strict = false,
        tieBreak = Seq("rid"))
      .select("k", "t", "tag", "rid", "rv").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        if (x.isNullAt(3)) -1L else x.getLong(3), x.getString(4))).toSet
    assert(out == Set(
      (1L, 10L, "a", 100L, "x"),   // equal time matches (inclusive)
      (1L, 20L, "b", 101L, "y"),   // latest at-or-before
      (2L, 5L, "c", -1L, null)))   // nothing at-or-before → nulls
  }

  test("asofJoin strict: equal-time right row is NOT visible; ties broken by max tieBreak") {
    val l = leftDf((1L, 10L, "a"), (1L, 30L, "b"))
    val r = rightDf((1L, 10L, 100L, "x"), (1L, 20L, 101L, "y"), (1L, 20L, 102L, "z"))
    val out = Temporal.asofJoin(l, r, "k", "t", strict = true, tieBreak = Seq("rid"))
      .select("t", "rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    // t=10 sees nothing (strict); t=30 sees both t=20 rows → max rid (102) wins
    assert(out == Set((10L, -1L), (30L, 102L)))
  }

  test("property: asofJoin ≡ naive inequality-join argmax on random inputs") {
    val genCase = for {
      nl <- Gen.choose(1, 12)
      nr <- Gen.choose(0, 12)
      l <- Gen.listOfN(nl, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 20L)))
      r <- Gen.listOfN(nr, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 20L)))
      strict <- Gen.oneOf(true, false)
    } yield (l, r, strict)
    val prop = Prop.forAll(genCase) { case (lRows, rRows, strict) =>
      val l = lRows.zipWithIndex.map { case ((k, t), i) => (k, t, s"l$i") }
        .toDF("k", "t", "tag")
      val r = rRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong, s"r$i") }
        .toDF("k", "t", "rid", "rv")
      val got = Temporal.asofJoin(l, r, "k", "t", strict, tieBreak = Seq("rid"))
        .select("tag", "rid").collect()
        .map(x => x.getString(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      // naive: for each left row the max-(t, rid) right row at/or strictly before
      val want = lRows.zipWithIndex.map { case ((k, t), i) =>
        val cands = rRows.zipWithIndex
          .filter { case ((rk, rt), _) => rk == k && (if (strict) rt < t else rt <= t) }
        s"l$i" -> (if (cands.isEmpty) -1L
                   else cands.maxBy { case ((_, rt), ri) => (rt, ri.toLong) }._2.toLong)
      }.toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: rangeJoin ≡ naive inequality join, across bucket widths") {
    val genCase = for {
      np <- Gen.choose(1, 10)
      ni <- Gen.choose(0, 10)
      ps <- Gen.listOfN(np, Gen.choose(0L, 50L))
      ivs <- Gen.listOfN(ni, Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 15L)))
      w <- Gen.oneOf(1L, 3L, 7L, 64L)
    } yield (ps, ivs, w)
    val prop = Prop.forAll(genCase) { case (ps, ivs, w) =>
      val points = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "pt")
      val intervals = ivs.zipWithIndex.map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
        .toDF("iid", "lo", "hi")
      val got = Temporal.rangeJoin(points, "pt", intervals, "lo", "hi", w)
        .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = (for {
        (p, pi) <- ps.zipWithIndex
        ((lo, len), ii) <- ivs.zipWithIndex
        if p >= lo && p <= lo + len
      } yield (pi.toLong, ii.toLong)).toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("heavyHitters: exact counts, exact threshold, regardless of sketch collisions") {
    // tiny width forces collisions — the exact rescore must still filter
    // down to precisely the true heavy keys
    val facts = (Seq.fill(10)(1L) ++ Seq.fill(5)(2L) ++ Seq.fill(3)(3L) ++ Seq(4L))
      .toDF("k")
    val dim = (1L to 8L).toDF("k")
    for (width <- Seq(2, 4, 1024)) {
      val got = Sketches.heavyHitters(facts, "k", dim, minCount = 4L,
          depth = 3, width = width)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 10L, 2L -> 5L), s"width=$width")
    }
  }

  test("countMin never underestimates (CMS guarantee) on random inputs") {
    val gen = Gen.listOfN(60, Gen.choose(1L, 12L))
    val prop = Prop.forAll(gen) { keys =>
      val facts = keys.toDF("k")
      val width = 8
      val sketch = Sketches.countMin(facts, "k", depth = 3, width = width).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      truth.forall { case (k, n) =>
        val est = (0 until 3).map { d =>
          val b = facts.sparkSession.range(1).select(
            pmod(xxhash64(lit(d), lit(k)), lit(width.toLong))).head().getLong(0)
          sketch.getOrElse((d, b), 0L)
        }.min
        est >= n
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------------ funnel

  private def eventsDf(rows: (Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("user", "us", "etype")
      .select(col("user"), timestamp_micros(col("us")).as("ts"), col("etype"))

  test("funnel: greedy in-order matching; out-of-order steps do not count") {
    val ev = eventsDf(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"), // full
      (2L, 100L, "purchase"), (2L, 200L, "view"), (2L, 300L, "click"), // 2 steps
      (3L, 100L, "view"),                                              // 1 step
      (4L, 100L, "click"))                                             // 0 steps
    val got = Temporal.funnel(ev, "user", "ts", "etype",
        Seq("view", "click", "purchase"), maxSpanUs = 1000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    assert(got == Map(1L -> ((3L, true)), 2L -> ((2L, false)),
      3L -> ((1L, false)), 4L -> ((0L, false))))
  }

  test("funnel: completion outside maxSpan is matched but not completed") {
    val ev = eventsDf((1L, 0L, "view"), (1L, 50L, "click"), (1L, 2000L, "purchase"))
    val r = Temporal.funnel(ev, "user", "ts", "etype",
      Seq("view", "click", "purchase"), maxSpanUs = 1000L).collect().head
    assert(r.getLong(4) == 3L && !r.getBoolean(5))
    // boundary: span exactly maxSpan completes
    val r2 = Temporal.funnel(ev, "user", "ts", "etype",
      Seq("view", "click", "purchase"), maxSpanUs = 2000L).collect().head
    assert(r2.getBoolean(5))
  }

  test("funnel: greedy anchors at the EARLIEST step-1 event") {
    // a later view (t=150) would complete within span, but greedy anchors at
    // t=0 — the documented deterministic semantics
    val ev = eventsDf((1L, 0L, "view"), (1L, 150L, "view"), (1L, 200L, "click"),
      (1L, 900L, "purchase"))
    val r = Temporal.funnel(ev, "user", "ts", "etype",
      Seq("view", "click", "purchase"), maxSpanUs = 800L).collect().head
    assert(r.getLong(1) == 0L && r.getLong(4) == 3L && !r.getBoolean(5))
  }

  test("funnel: equivalent to the naive greedy fold on random event streams") {
    val types = Seq("view", "click", "purchase", "error")
    val steps = Seq("view", "click", "purchase")
    // reference: t_i = min ts of step-i events strictly after t_{i-1}
    def ref(evs: Seq[(Long, String)]): List[Long] =
      steps.foldLeft(List.empty[Long]) { (acc, st) =>
        if (acc.length < steps.indexOf(st)) acc // chain already broken
        else {
          val after = acc.lastOption.getOrElse(Long.MinValue)
          val cand = evs.collect { case (ts, t) if t == st && ts > after => ts }
          if (cand.isEmpty) acc else acc :+ cand.min
        }
      }
    val genEvents = Gen.listOfN(40, for {
      u <- Gen.choose(1L, 4L)
      ts <- Gen.choose(1L, 60L)
      t <- Gen.oneOf(types)
    } yield (u, ts, t))
    val prop = Prop.forAll(genEvents) { evs =>
      val df = eventsDf(evs: _*)
      val got = Temporal.funnel(df, "user", "ts", "etype", steps, maxSpanUs = 30L)
        .collect().map(r => r.getLong(0) ->
          ((1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))),
            r.getLong(4))).toMap
      evs.groupBy(_._1).forall { case (u, es) =>
        val want = ref(es.map(e => (e._2, e._3)))
        val (ts, done) = got(u)
        done == want.length.toLong &&
          ts.zipWithIndex.forall { case (t, i) => t == want.lift(i) }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------------ retention

  test("cohortRetention: triangle counts; pre-anchor activity excluded") {
    val week = 1000L
    val ev = eventsDf(
      (1L, 0L, "signup"), (1L, 1500L, "click"),              // cohort 0, active 0 & 1
      (2L, 1100L, "signup"), (2L, 2500L, "click"),           // cohort 1, active 1 & 2
      (3L, 500L, "click"),                                   // never signed up
      (4L, 2200L, "signup"), (4L, 100L, "click"))            // cohort 2; t=100 is BEFORE
    val got = Temporal.cohortRetention(ev, "user", "ts", "etype", "signup", week)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 1L, (0L, 1L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L, (2L, 0L) -> 1L))
  }

  // ----------------------------------------------------------------- SCD2

  private def scd2Df(rows: (Long, Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("user", "us", "eid", "etype")
      .select(col("user"), timestamp_micros(col("us")).as("ts"),
        col("eid"), col("etype"))

  test("scd2: runs collapse, changes open intervals, valid_to chains, NULL = current") {
    val ev = scd2Df(
      (1L, 100L, 1L, "a"), (1L, 200L, 2L, "a"), (1L, 300L, 3L, "b"),
      (1L, 400L, 4L, "a"),                       // a×2 → b → a again (new run)
      (2L, 50L, 5L, "x"))
    val got = Temporal.scd2(ev, "user", "ts", "eid", "etype")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      (1L, 1L, "a", 100L, 300L, 2L),
      (1L, 2L, "b", 300L, 400L, 1L),
      (1L, 3L, "a", 400L, -1L, 1L),
      (2L, 1L, "x", 50L, -1L, 1L)))
  }

  test("scd2: ties on ts break on the id column (total order)") {
    // same timestamp, ids decide the order: eid 1 ("a") before eid 2 ("b")
    val ev = scd2Df((1L, 100L, 1L, "a"), (1L, 100L, 2L, "b"))
    val got = Temporal.scd2(ev, "user", "ts", "eid", "etype")
      .collect().map(r => (r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }
}
