package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.Dedup

/** Pins [[Dedup.substringDedup]]'s duplicated-L-gram reformulation against
  * the DEFINITION: a character is removed iff it sits inside SOME substring
  * of length ≥ L occurring at two or more distinct (doc, offset) positions
  * in the corpus — brute-forced here by enumerating every span of every
  * length ≥ L and counting its occurrences with an overlapping indexOf
  * scan. Random two-letter-alphabet corpora keep duplicate density high.
  */
class SubstringDedupSpec extends AnyFunSuite with SparkSpec {

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** All occurrence start offsets of `sub` in `s`, overlapping included. */
  private def occurrences(s: String, sub: String): Seq[Int] = {
    val b = Seq.newBuilder[Int]
    var i = s.indexOf(sub)
    while (i >= 0) { b += i; i = s.indexOf(sub, i + 1) }
    b.result()
  }

  /** The definitional removal mask: docId -> covered-position flags. */
  private def bruteMask(docs: Seq[(Long, String)], minLen: Int): Map[Long, Array[Boolean]] = {
    val mask = docs.map { case (id, t) => id -> new Array[Boolean](t.length) }.toMap
    for {
      (id, t) <- docs
      s <- 0 to t.length - minLen
      e <- (s + minLen) to t.length
      sub = t.substring(s, e)
      // distinct (doc, offset) occurrence count across the whole corpus
      if docs.iterator.map { case (_, u) => occurrences(u, sub).size }.sum >= 2
      p <- s until e
    } mask(id)(p) = true
    mask
  }

  test("property: substringDedup ≡ naive all-spans duplicated-substring scan") {
    import spark.implicits._
    val genDoc = for {
      len <- Gen.choose(0, 24)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val genCorpus = for {
      n <- Gen.choose(1, 6)
      ds <- Gen.listOfN(n, genDoc)
    } yield ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val prop = Prop.forAll(genCorpus, Gen.choose(3, 6)) { (docs, minLen) =>
      val mask = bruteMask(docs, minLen)
      val expect = docs.map { case (id, t) =>
        val m = mask(id)
        val spans = {
          // runs of covered positions
          var n = 0; var i = 0
          while (i < m.length) {
            if (m(i) && (i == 0 || !m(i - 1))) n += 1
            i += 1
          }
          n
        }
        val kept = t.zipWithIndex.collect { case (c, i) if !m(i) => c }.mkString
        id -> ((t.length.toLong, spans.toLong, m.count(identity).toLong, sha256Hex(kept)))
      }.toMap
      val got = Dedup.substringDedup(
          docs.toDF("doc_id", "text"), "doc_id", "text", minLen)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("substringDedup fixture: overlapping within-doc repeat and a clean doc") {
    import spark.implicits._
    // doc 0: "aaaaaaaaaa" — every 4-gram repeats (overlapping), whole doc removed
    // doc 1: shares a 6-char span with doc 2 at different offsets
    // doc 3: all-distinct content, untouched
    val docs = Seq(
      (0L, "aaaaaaaaaa"),
      (1L, "xxQWERTYzz"),
      (2L, "ppppQWERTY"),
      (3L, "bcdefghijk")).toDF("doc_id", "text")
    val got = Dedup.substringDedup(docs, "doc_id", "text", minLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(0L) == ((1L, 10L, sha256Hex(""))))
    assert(got(1L) == ((1L, 6L, sha256Hex("xxzz"))))
    assert(got(2L) == ((1L, 6L, sha256Hex("pppp"))))
    assert(got(3L) == ((0L, 0L, sha256Hex("bcdefghijk"))))
  }

  /** Keep-first removal mask: char (d, i) removed iff SOME span ∋ i of
    * length ≥ L occurs at a strictly smaller (doc, offset). */
  private def bruteMaskKeepFirst(docs: Seq[(Long, String)], minLen: Int): Map[Long, Array[Boolean]] = {
    val mask = docs.map { case (id, t) => id -> new Array[Boolean](t.length) }.toMap
    val order = docs.sortBy(_._1)
    for {
      (id, t) <- docs
      s <- 0 to t.length - minLen
      e <- (s + minLen) to t.length
      sub = t.substring(s, e)
      if order.exists { case (oid, u) =>
        occurrences(u, sub).exists(p =>
          oid < id || (oid == id && p < s)) }
      p <- s until e
    } mask(id)(p) = true
    mask
  }

  test("property: keep-first ≡ naive earlier-occurrence scan; first copies survive") {
    import spark.implicits._
    val genDoc = for {
      len <- Gen.choose(0, 24)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val genCorpus = for {
      n <- Gen.choose(1, 6)
      ds <- Gen.listOfN(n, genDoc)
    } yield ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val prop = Prop.forAll(genCorpus, Gen.choose(3, 6)) { (docs, minLen) =>
      val mask = bruteMaskKeepFirst(docs, minLen)
      val allMask = bruteMask(docs, minLen)
      val expect = docs.map { case (id, t) =>
        val m = mask(id)
        val kept = t.zipWithIndex.collect { case (c, i) if !m(i) => c }.mkString
        id -> ((m.count(identity).toLong, sha256Hex(kept)))
      }.toMap
      val got = Dedup.substringDedupKeepFirst(
          docs.toDF("doc_id", "text"), "doc_id", "text", minLen)
        .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
      // keep-first removes a subset of what remove-all removes
      val subset = docs.forall { case (id, t) =>
        (0 until t.length).forall(i => !mask(id)(i) || allMask(id)(i)) }
      got == expect && subset
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("substringDedupKeepFirst fixture: first copies survive, later copies removed") {
    import spark.implicits._
    val docs = Seq(
      (0L, "aaaaaaaaaa"),   // self-overlap: only the first 'aaaa' window survives
      (1L, "xxQWERTYzz"),   // first QWERTY in corpus order — fully kept
      (2L, "ppppQWERTY"),   // later copy — QWERTY span removed
      (3L, "bcdefghijk")).toDF("doc_id", "text")
    val got = Dedup.substringDedupKeepFirst(docs, "doc_id", "text", minLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(0L) == ((1L, 9L, sha256Hex("a"))))
    assert(got(1L) == ((0L, 0L, sha256Hex("xxQWERTYzz"))))
    assert(got(2L) == ((1L, 6L, sha256Hex("pppp"))))
    assert(got(3L) == ((0L, 0L, sha256Hex("bcdefghijk"))))
  }

  test("keep-first packed-min envelope: id >= 2^31 raises instead of silently corrupting") {
    import spark.implicits._
    val wide = Seq(
      (2147483648L, "xxQWERTYzz"),
      (1L, "ppppQWERTY")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.substringDedupKeepFirst(wide, "doc_id", "text", minLen = 4)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("packed-min envelope")),
      s"expected the envelope assertion, got: ${messages(e).mkString(" | ")}")
    // in-envelope ids are untouched by the guard
    val ok = Seq((2147483647L, "xxQWERTYzz"), (1L, "ppppQWERTY"))
      .toDF("doc_id", "text")
    val got = Dedup.substringDedupKeepFirst(ok, "doc_id", "text", minLen = 4)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2147483647L))
  }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Anchored removal mask per the definition: position p of doc t opens a
    * removed window iff p is a content-defined anchor (md5 of its leading
    * k chars starts with `z` zero hex digits) AND its L-gram occurs ≥ 2
    * times in the corpus (all occurrences of one gram content anchor
    * identically, so the full occurrence count IS the anchored count). */
  private def bruteMaskAnchored(docs: Seq[(Long, String)], minLen: Int,
      k: Int, z: Int): Map[Long, Array[Boolean]] = {
    val mask = docs.map { case (id, t) => id -> new Array[Boolean](t.length) }.toMap
    for {
      (id, t) <- docs
      s <- 0 to t.length - minLen
      if md5Hex(t.substring(s, s + k)).startsWith("0" * z)
      sub = t.substring(s, s + minLen)
      if docs.iterator.map { case (_, u) => occurrences(u, sub).size }.sum >= 2
      p <- s until (s + minLen)
    } mask(id)(p) = true
    mask
  }

  test("property: anchored ≡ anchored-position scan; removal set ⊆ remove-all's") {
    import spark.implicits._
    val genDoc = for {
      len <- Gen.choose(0, 24)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val genCorpus = for {
      n <- Gen.choose(1, 6)
      ds <- Gen.listOfN(n, genDoc)
    } yield ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // anchorK=1 over {a,b}: md5("a")=0cc1… anchors, md5("b")=92eb… does
    // not — a deterministic ~50% anchor density that exercises both kept
    // and thinned positions in every corpus
    val prop = Prop.forAll(genCorpus, Gen.choose(3, 6), Gen.choose(1, 2)) {
      (docs, minLen, anchorK) =>
        val mask = bruteMaskAnchored(docs, minLen, anchorK, 1)
        val allMask = bruteMask(docs, minLen)
        val expect = docs.map { case (id, t) =>
          val m = mask(id)
          val kept = t.zipWithIndex.collect { case (c, i) if !m(i) => c }.mkString
          id -> ((m.count(identity).toLong, sha256Hex(kept)))
        }.toMap
        val got = Dedup.substringDedupAnchored(
            docs.toDF("doc_id", "text"), "doc_id", "text", minLen,
            anchorK = anchorK, hexZeros = 1)
          .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
        // sampling may only LOSE coverage, never invent it
        val subset = docs.forall { case (id, t) =>
          (0 until t.length).forall(i => !mask(id)(i) || allMask(id)(i)) }
        got == expect && subset
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("anchored coverage floor: ≥ 70% of exact removal mass on the boilerplate fixture") {
    import spark.implicits._
    // the at-scale workload shape: long verbatim boilerplate (240 chars
    // ≫ minLen=40) injected into several documents with unique
    // neighborhoods — anchors land ~16 apart inside the block, so the
    // island merge recovers its interior wall-to-wall and loss
    // concentrates at the edges (≲ 16 + 39 chars of 240 per carrier)
    val rnd = new scala.util.Random(42)
    def blob(n: Int): String =
      Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val bp = blob(240)
    val docs = Seq(
      (0L, s"${blob(30)}$bp${blob(30)}"),
      (1L, s"${blob(25)}$bp${blob(35)}"),
      (2L, s"${blob(40)}$bp${blob(20)}"),
      (3L, blob(300))).toDF("doc_id", "text")
    def mass(df: org.apache.spark.sql.DataFrame): (Long, Map[Long, Long]) = {
      val rows = df.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      (rows.values.sum, rows)
    }
    val (exactMass, exactByDoc) =
      mass(Dedup.substringDedup(docs, "doc_id", "text", minLen = 40))
    val (anchMass, anchByDoc) =
      mass(Dedup.substringDedupAnchored(docs, "doc_id", "text", minLen = 40,
        anchorK = 8, hexZeros = 1))
    // ≥ the injected block (random neighborhoods can add a coincidental
    // duplicated gram or two); the blob-only doc stays clean
    assert(exactByDoc(0L) >= 240L && exactByDoc(3L) == 0L)
    // every boilerplate carrier detected; the clean doc untouched
    (0L to 2L).foreach(id => assert(anchByDoc(id) > 0L,
      s"carrier $id missed entirely by the anchored variant"))
    assert(anchByDoc(3L) == 0L)
    // the stated coverage floor (SCALE.md): ≥ 70% of exact removal mass
    assert(anchMass * 10 >= exactMass * 7,
      s"anchored covered $anchMass of $exactMass exact dup chars (< 70%)")
  }

  test("skew stress: a mega-gram reduces map-side — per-gram state is one counter/struct, never a sorted occurrence list") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the SCALE.md mega-gram claim, executable: ONE 40-char boilerplate
    // block in 2000 documents (hot key: its gram occurs 2000×, everything
    // else is unique). Both policies must (a) produce the exact per-doc
    // answer and (b) show PARTIAL aggregation on the gram-keyed confirm in
    // the plan — the structural guarantee that a gram occurring 10⁸ times
    // at 100 TB reduces inside each map task instead of co-locating every
    // occurrence into one task (the q208 row_number window this suite
    // replaced had no partial form).
    val bp = "BOILERPLATEBLOCKBOILERPLATEBLOCK40CHARS!"
    assert(bp.length == 40)
    val docs = (0L until 2000L)
      .map(i => (i, f"u$i%06de$bp n$i%06dx")).toDF("doc_id", "text")
    // remove-all: every carrier loses at least the block (id digits
    // adjacent to it coincide between SOME pair of docs, so spans may
    // extend a few chars past 40 — irrelevant to the skew claim)
    val all = Dedup.substringDedup(docs, "doc_id", "text", minLen = 40)
      .select(col("id"), col("dup_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all.size == 2000 && all.values.forall(_ >= 40L),
      "remove-all must cover at least the block in every carrier")
    // keep-first: doc 0 holds the FIRST (min (id, pos)) occurrence of
    // every gram it contains (nothing repeats within it), so it is
    // exactly clean; every later doc loses at least the block
    val kf = Dedup.substringDedupKeepFirst(docs, "doc_id", "text", minLen = 40)
      .select(col("id"), col("dup_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kf(0L) == 0L && (1L until 2000L).forall(kf(_) >= 40L),
      "keep-first must spare the first occurrence and strip the rest")
    // plan pins (cache=false keeps the candidate path visible)
    val pAll = Dedup.substringDedup(docs, "doc_id", "text", 40, cache = false)
      .queryExecution.executedPlan.toString
    assert(pAll.contains("partial_count"),
      "remove-all's gram confirm must have a map-side partial count")
    val pKf = Dedup.substringDedupKeepFirst(docs, "doc_id", "text", 40, cache = false)
      .queryExecution.executedPlan.toString
    assert(pKf.contains("partial_min"),
      "keep-first's winner must come from a map-side partial min")
  }

  test("topBoilerplate: most-frequent maximal span leads; counts split occurrences vs docs") {
    import spark.implicits._
    // one 12-char boilerplate block in four docs (one doc carries it
    // TWICE), a 6-char span shared by two docs. Every char ADJACENT to a
    // repeated block is unique per occurrence — a shared neighbor would
    // (correctly) extend the maximal span and change its digest
    val bp = "CALLXYZTODAY"
    val docs = Seq(
      (0L, s"aa1${bp}zz1"),
      (1L, s"bb22${bp}yy22"),
      (2L, s"c3${bp}x5${bp}ww"),
      (3L, s"dd4444${bp}vv4444"),
      (4L, "ee50505QWERTY05050"),
      (5L, "ff61616QWERTY16161")).toDF("doc_id", "text")
    val got = Dedup.topBoilerplate(docs, "doc_id", "text", minLen = 6, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.head == ((sha256Hex(bp), 12L, 5L, 4L)),
      s"expected the $bp block first, got ${got.head}")
    assert(got.exists(_ == ((sha256Hex("QWERTY"), 6L, 2L, 2L))))
    // ranking is by occurrence count, digest tie-broken — strictly ordered
    assert(got.map(-_._3).toSeq == got.map(-_._3).sorted.toSeq)
  }
}
