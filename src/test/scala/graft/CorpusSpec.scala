package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.Corpus

class CorpusSpec extends AnyFunSuite with SparkSpec {

  private def docsDF(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("tfidfTopK ranks a doc-specific term above corpus-wide terms") {
    // "zebra" appears only in doc 1; "common" is in every doc
    val d = docsDF(
      1L -> "common zebra zebra common",
      2L -> "common words here common",
      3L -> "common other stuff common")
    val top = Corpus.tfidfTopK(d, "doc_id", "text", k = 1)
      .filter(col("id") === 1L).collect()
    assert(top.length == 1)
    assert(top(0).getAs[String]("w") == "zebra")
    // tf=2, df=1, N=3: quantized tfidf must be positive and exact-integer
    assert(top(0).getAs[Long]("tfidf_q") ==
      math.floor(2.0 * (math.log(4.0 / 2.0) + 1.0) * 1e6 + 0.5).toLong)
  }

  test("bm25: a doc hitting more query terms (same length) outranks fewer hits") {
    val d = docsDF(
      1L -> "join window scan pad pad pad",
      2L -> "join pad pad pad pad pad",
      3L -> "nothing relevant at all here now")
    val out = Corpus.bm25(d, "doc_id", "text", Seq("join", "window", "scan"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!out.contains(3L)) // no hits -> absent
    assert(out(1L)._1 == 3 && out(2L)._1 == 1)
    assert(out(1L)._2 > out(2L)._2)
  }

  test("qualityRules: repetition and word-count gates fire; clean doc passes") {
    val longClean = (1 to 40).map(i => s"word$i").mkString(" ") + " the of to and a"
    val repetitive = ("spam " * 45).trim // one word holds ~all characters
    val tiny = "the of and"
    val d = docsDF(1L -> longClean, 2L -> repetitive, 3L -> tiny)
    val byId = Corpus.qualityRules(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Boolean]("pass"))
    assert(!byId(2L).getAs[Boolean]("pass")) // top_word_char_frac = 1.0
    assert(byId(2L).getAs[Double]("top_word_char_frac") == 1.0)
    assert(!byId(3L).getAs[Boolean]("pass")) // 3 words < minWords
  }

  test("unigramLogProb: rare-token docs score lower; gate is the integer cross-multiply") {
    // "zzz" occurs once in the corpus; "common" dominates
    val d = docsDF(
      1L -> "common common common common",
      2L -> "common common common zzz")
    val out = Corpus.unigramLogProb(d, "doc_id", "text", minAvgLpQ = -1000000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    val total = 8.0
    def lpq(c: Long) = math.floor(math.log(c / total) * 1e6 + 0.5).toLong
    assert(out(1L).getAs[Long]("sum_lp_q") == 4 * lpq(7))
    assert(out(2L).getAs[Long]("sum_lp_q") == 3 * lpq(7) + lpq(1))
    assert(out(2L).getAs[Long]("sum_lp_q") < out(1L).getAs[Long]("sum_lp_q"))
    // avg(doc1) = ln(7/8) ≈ −0.134 ≥ −1.0 passes; doc2 avg ≈ −0.62 passes too;
    // a −0.2 gate separates them
    val strict = Corpus.unigramLogProb(d, "doc_id", "text", minAvgLpQ = -200000L)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("pass_ppl")).toMap
    assert(strict(1L) && !strict(2L))
  }

  test("dsirWeights: target-vocabulary docs score positive, off-target negative, hand-checked") {
    import spark.implicits._
    // two disjoint vocabularies: "good" lives only in target docs, "junk"
    // only in raw-only docs; a mixed doc leans by majority token
    val d = Seq(
      (1L, "good good good", true),
      (2L, "good good junk", true),
      (3L, "junk junk junk", false),
      (4L, "junk junk good", false),
      (5L, "good junk", false)
    ).toDF("doc_id", "text", "is_tgt")
    val out = Corpus.dsirWeights(d, "doc_id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // hand-compute: cnt_r(good)=7, cnt_t(good)=5, cnt_r(junk)=7, cnt_t(junk)=1,
    // tot_r=14, tot_t=6, V=2
    def lpq(ct: Long, cr: Long) =
      math.floor(math.log(((ct + 1.0) * 16.0) / ((cr + 1.0) * 8.0)) * 1e6 + 0.5).toLong
    val g = lpq(5, 7); val j = lpq(1, 7)
    assert(out(1L).getAs[Long]("dsir_q") == 3 * g)
    assert(out(3L).getAs[Long]("dsir_q") == 3 * j)
    assert(out(5L).getAs[Long]("dsir_q") == g + j)
    // good is target-heavy (positive), junk target-light (negative)
    assert(g > 0 && j < 0)
    assert(out(1L).getAs[Boolean]("keep") && out(2L).getAs[Boolean]("keep"))
    assert(!out(3L).getAs[Boolean]("keep") && !out(4L).getAs[Boolean]("keep"))
    // n_tokens is the plain token count
    assert(out(1L).getAs[Long]("n_tokens") == 3 && out(5L).getAs[Long]("n_tokens") == 2)
  }

  test("perplexityBuckets: per-language tiers, common-vocab docs land in the head") {
    import spark.implicits._
    // lang x: doc 1 is pure dominant-token (head); the hapax doc 3 still
    // outranks doc 2, whose rare "beta" drags its average below ln(3/9) —
    // the hand-order below works this out. lang y: sizes [1,1,1] over 3 docs.
    val d = Seq(
      (1L, "alpha alpha alpha", "x"),
      (2L, "alpha alpha beta", "x"),
      (3L, "zeta zeta zeta", "x"),
      (4L, "mu mu", "y"),
      (5L, "mu nu", "y"),
      (6L, "xi xi", "y")
    ).toDF("doc_id", "text", "lang")
    val out = Corpus.perplexityBuckets(d, "doc_id", "text", "lang", nTiles = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // lang x: avg lp ranks 1 (pure alpha) > 2 (alpha-heavy) > 3 (pure hapax...
    // zeta count 3 of 9: same freq as... hand-order: alpha cnt=5, beta=1, zeta=3
    // doc1 avg=ln(5/9); doc2=(2ln(5/9)+ln(1/9))/3; doc3=ln(3/9) → 1 > 3 > 2
    assert(out(1L).getAs[String]("tier") == "head")
    assert(out(3L).getAs[String]("tier") == "middle")
    assert(out(2L).getAs[String]("tier") == "tail")
    // every language distributes over all three tiers when it has ≥3 docs
    Seq("x", "y").foreach { l =>
      val tiers = out.values.filter(_.getAs[String]("lang") == l)
        .map(_.getAs[String]("tier")).toSet
      assert(tiers == Set("head", "middle", "tail"), s"lang $l tiers: $tiers")
    }
    // buckets are per-language ntile: each of x's 3 docs gets its own bucket
    assert(out.values.filter(_.getAs[String]("lang") == "x")
      .map(_.getAs[Long]("bucket")).toSet == Set(1L, 2L, 3L))
  }

  test("pmiPhrases: glued bigram scores high, chance co-occurrence low, hand-computed") {
    // "new york" always adjacent (a phrase); "the cat"/"the dog"/"cat the"...
    // scattered fillers co-occur only by chance
    val d = docsDF(
      1L -> "new york the cat new york",
      2L -> "new york the dog new york",
      3L -> "cat the dog the new york")
    val out = Corpus.pmiPhrases(d, "doc_id", "text", minCount = 2L, minPmiQ = 1000000L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ny = out(("new", "york"))
    // hand-counts: "new york" appears 5×, new=5, york=5, tot_uni=18 (3 docs ×
    // 6 tokens), tot_big=15 (3 docs × 5 bigrams)
    assert(ny.getAs[Long]("cnt_big") == 5L)
    assert(ny.getAs[Long]("cnt_w1") == 5L && ny.getAs[Long]("cnt_w2") == 5L)
    val expectNy = math.floor(
      math.log((5.0 * 18.0 * 18.0) / (5.0 * 5.0 * 15.0)) * 1e6 + 0.5).toLong
    assert(ny.getAs[Long]("pmi_q") == expectNy)
    assert(ny.getAs[Boolean]("is_phrase"), s"new york pmi_q=${ny.getAs[Long]("pmi_q")}")
    // bigrams under minCount don't surface at all
    assert(!out.contains(("the", "cat")) || out(("the", "cat")).getAs[Long]("cnt_big") >= 2)
  }

  test("mixtureSchedule: positions are a permutation; stride interleaves by weight") {
    import spark.implicits._
    val d = (1L to 8L).map(i => (i, if (i <= 6) "big" else "small"))
      .toDF("doc_id", "source")
    val out = Corpus.mixtureSchedule(d, "doc_id", "source").collect()
    assert(out.map(_.getAs[Long]("position")).sorted.sameElements(1L to 8L))
    // stride keeps within-source order: src_rank increases with position
    Seq("big", "small").foreach { s =>
      val rs = out.filter(_.getAs[String]("source") == s)
        .sortBy(_.getAs[Long]("position")).map(_.getAs[Long]("src_rank"))
      assert(rs.sameElements(rs.sorted), s"source $s emitted out of order")
    }
    // w_big=⌊√6·1e6⌋, w_small=⌊√2·1e6⌋: big's vtime step ≈ 4.1e-7, small's
    // ≈ 7.1e-7 — big1 precedes small1, and small never clumps at the front
    val firstSmall = out.filter(_.getAs[String]("source") == "small")
      .map(_.getAs[Long]("position")).min
    assert(firstSmall >= 2, s"small source scheduled too early: $firstSmall")
  }

  test("bigramLogProb: interpolated probs hand-computed; single-token docs drop") {
    val d = docsDF(1L -> "a b a b", 2L -> "a b", 3L -> "solo")
    val out = Corpus.bigramLogProb(d, "doc_id", "text", minAvgLpQ = -1000000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    // uni: a=3, b=3, total=7 (incl. "solo"); cnt_big(a,b)=3, (b,a)=1
    def blp(cb: Long, c1: Long, c2: Long) = math.floor(math.log(
      0.5 * (cb.toDouble / c1.toDouble) + 0.5 * (c2.toDouble / 7.0))
      * 1e6 + 0.5).toLong
    val ab = blp(3, 3, 3); val ba = blp(1, 3, 3)
    assert(out(1L).getAs[Long]("n_bigrams") == 3L)
    assert(out(1L).getAs[Long]("sum_blp_q") == 2 * ab + ba)
    assert(out(2L).getAs[Long]("sum_blp_q") == ab)
    // doc1 avg = (2ab+ba)/3 ≈ -0.47e6 ≥ -1e6 passes; both pass at this gate
    assert(out(1L).getAs[Boolean]("pass_ppl") && out(2L).getAs[Boolean]("pass_ppl"))
  }

  test("decontaminateContainment: clean docs audited at zero; share gate cross-multiplies") {
    import spark.implicits._
    val corpus = docsDF(1L -> "x y z w", 2L -> "p q r")
    val eval = docsDF(10L -> "y z q")
    val out = Corpus.decontaminateContainment(corpus, eval, "doc_id", "text",
      n = 2, thresholdPct = 30)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    // doc1 grams {x y, y z, z w}; eval grams {y z, z q} → shared 1 of 3 = 33%
    assert(out(1L).getAs[Long]("n_grams") == 3L)
    assert(out(1L).getAs[Long]("n_shared") == 1L)
    assert(out(1L).getAs[Boolean]("contaminated"), "33% ≥ 30% must flag")
    // doc2 {p q, q r} shares nothing — present, zeroed, clean
    assert(out(2L).getAs[Long]("n_shared") == 0L)
    assert(!out(2L).getAs[Boolean]("contaminated"))
  }

  test("vocabReport: top-k ranks, hapax count and scalars, hand-computed") {
    val d = docsDF(1L -> "a a a b b c", 2L -> "b d")
    val rows = Corpus.vocabReport(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // counts: a=3, b=3, c=1, d=1 → rank1 a (tie w asc), rank2 b, rank3 c
    assert(rows(1L).getAs[String]("w") == "a" && rows(1L).getAs[Long]("cnt") == 3)
    assert(rows(2L).getAs[String]("w") == "b")
    assert(rows(3L).getAs[String]("w") == "c" && rows(3L).getAs[Long]("cnt") == 1)
    assert(rows(1L).getAs[Long]("vocab_size") == 4)
    assert(rows(1L).getAs[Long]("n_hapax") == 2)
    assert(rows(1L).getAs[Long]("total_tokens") == 8)
  }

  test("scrubPii: counts per class on pristine text; redaction is sequential") {
    val d = docsDF(
      1L -> "mail a@b.com and c.d+x@e.org call 555-123-4567 ip 10.0.0.1 ssn 123-45-6789",
      2L -> "no pii here at all")
    val out = Corpus.scrubPii(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") == 2)
    assert(out(1L).getAs[Long]("n_phones") == 1)
    assert(out(1L).getAs[Long]("n_ips") == 1)
    assert(out(1L).getAs[Long]("n_ids") == 1)
    assert(out(1L).getAs[String]("clean_text") ==
      "mail <EMAIL> and <EMAIL> call <PHONE> ip <IP> ssn <ID>")
    assert(out(2L).getAs[Long]("n_emails") == 0)
    assert(out(2L).getAs[String]("clean_text") == "no pii here at all")
  }

  test("boilerplate: share-based df threshold, hand-computed bigram ratios") {
    // bigrams: "a b" in all 3 docs (df=3); everything else df=1.
    // permille=600 of n_docs=3 → boiler iff df*1000 >= 600*3 → df >= 1.8
    val d = docsDF(1L -> "a b c", 2L -> "a b d", 3L -> "x a b")
    val out = Corpus.boilerplate(d, "doc_id", "text", n = 2,
        minDfPermille = 600L, flagRatio = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 bigrams: {a b, b c} → 1/2 boiler
    assert(out(1L).getAs[Long]("n_grams") == 2)
    assert(out(1L).getAs[Long]("n_boiler") == 1)
    assert(out(1L).getAs[Double]("boiler_ratio") == 0.5)
    assert(out(1L).getAs[Boolean]("flag_boiler"))
    assert(out(3L).getAs[Long]("n_boiler") == 1) // {x a, a b}
  }

  test("sampleStratified keeps EXACTLY ceil(rate*n) per stratum, deterministically") {
    import spark.implicits._
    val d = (1L to 95L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val kept = Corpus.sampleStratified(d, "doc_id", "lang", ratePct = 10)
    val byStratum = kept.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // strata sizes: a=31, b=64 -> quotas ceil(3.1)=4, ceil(6.4)=7
    assert(byStratum == Map("a" -> 4L, "b" -> 7L))
    // rerun is bit-identical (hash ranking, no RNG)
    val again = Corpus.sampleStratified(d, "doc_id", "lang", ratePct = 10)
    assert(kept.orderBy("stratum", "id").collect().toSeq ==
      again.orderBy("stratum", "id").collect().toSeq)
  }

  test("sampleTemperature: sqrt-weight quotas, hand-computed") {
    // strata: a has 4 docs, b has 1 → w_a=2e6, w_b=1e6, W=3e6;
    // targetN=3 → quota_a = ceil(3*2e6/3e6) = 2, quota_b = ceil(3*1e6/3e6) = 1
    import spark.implicits._
    val d = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "b"))
      .toDF("doc_id", "lang")
    val out = Corpus.sampleTemperature(d, "doc_id", "lang", targetN = 3L)
      .collect()
    val byStratum = out.groupBy(_.getAs[String]("stratum"))
    assert(byStratum("a").length == 2 && byStratum("a").head.getAs[Long]("quota") == 2)
    assert(byStratum("b").length == 1 && byStratum("b").head.getAs[Long]("quota") == 1)
    assert(byStratum("b").head.getAs[Long]("id") == 5L)
  }

  test("chunkSliding: ragged last chunk, 50%-style overlap, hand-computed") {
    val d = docsDF(1L -> "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")
    val out = Corpus.chunkSliding(d, "doc_id", "text", chunk = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Long]("chunk_idx")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n_tok")).toSeq == Seq(4L, 4L, 4L, 1L))
    // distinct contents hash distinctly; same content would collide
    assert(out.map(_.getAs[String]("chunk_sha")).distinct.length == 4)
  }

  test("packSequences: offsets chain exactly; chunk boundaries split mid-document") {
    // one shard (nShards=1): docs of 300+300+300 tokens into 512-token seqs
    val txt = (1 to 300).map(_ => "tok").mkString(" ")
    val d = docsDF(1L -> txt, 2L -> txt, 3L -> txt)
    val placed = Corpus.packSequences(d, "doc_id", "text", seqLen = 512, nShards = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))) // id, seq_id, offset
    assert(placed.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L)))
  }

  test("decontaminate flags only docs sharing a full n-gram with the eval set") {
    val run = "one two three four five six seven eight"
    val corpus = docsDF(
      1L -> (run + " trailing words here"),   // shares the full 8-gram
      2L -> "one two three four nine ten eleven twelve unrelated") // only a 4-run
    val eval = docsDF(100L -> (run + " and an eval tail"))
    val hits = Corpus.decontaminate(corpus, eval, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq == Seq((1L, 1L)))
  }

  test("capPerStratum: keeps the top-TTR docs per stratum, exact integer ratio") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "a b c d"),   // ttr 4/4 → 1000000
      (2L, "s1", "a a a a"),   // 1/4 → 250000
      (3L, "s1", "a b a b"),   // 2/4 → 500000
      (4L, "s2", "x y")        // 2/2 → 1000000
    ).toDF("doc_id", "source", "text")
    val got = Corpus.capPerStratum(docs, "doc_id", "source", "text", maxDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getInt(5)))
    assert(got.toSet == Set(
      ("s1", 1L, 1000000L, 1), ("s1", 3L, 500000L, 2), ("s2", 4L, 1000000L, 1)))
  }

  test("epochOrder: per-epoch permutation, balanced round-robin shards, epochs differ") {
    import spark.implicits._
    val docs = (1L to 100L).toDF("doc_id")
    val got = Corpus.epochOrder(docs, "doc_id", epochs = 2, nShards = 4).collect()
    assert(got.length == 200)
    val byEpoch = got.groupBy(_.getLong(0))
    assert(byEpoch.keySet == Set(0L, 1L))
    byEpoch.values.foreach { rows =>
      // positions are exactly the permutation 1..100
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to 100L))
      // round-robin over position ⇒ perfectly balanced shards
      assert(rows.groupBy(_.getLong(3)).values.map(_.size).toSet == Set(25))
    }
    // the two epochs order the ids differently (seeded by the epoch)
    def order(ep: Long) =
      byEpoch(ep).sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
    assert(order(0L) != order(1L))
  }

  test("tfidfKnn: self excluded, near-identical doc ranks first, ranks contiguous") {
    import org.apache.spark.sql.functions.col
    val docs = docsDF(
      1L -> "apple banana cherry date egg",
      2L -> "apple banana cherry date fig",   // shares 4 of 5 terms with 1
      3L -> "car train plane boat bike",      // shares nothing with 1
      4L -> "apple train zebra quartz nut")   // shares 1 term with 1
    val got = Corpus.tfidfKnn(docs, "doc_id", "text", k = 2,
      maxDfPct = 100, queryPred = col("id") === 1L).collect()
    assert(got.forall(_.getLong(0) == 1L))
    assert(got.forall(_.getLong(2) != 1L)) // never its own neighbor
    assert(got.map(_.getInt(1)).sorted.toSeq == Seq(1, 2))
    val byRank = got.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    assert(byRank == Seq(2L, 4L)) // doc 3 shares no postings → absent
  }

  test("bpeMerges learns the classic low/lower/newest/widest merge table") {
    // Sennrich et al.'s worked example, corpus-weighted:
    //   low×3  lower×2  newest×4  widest×1
    // iter 1: (w,e) 2+4=6;  iter 2: (l,o) 5 ties (s,t) 5, lex wins;
    // iter 3: (s,t) 5.
    val d = docsDF(
      1L -> "low low low lower lower",
      2L -> "newest newest newest newest widest")
    val got = Corpus.bpeMerges(d, "text", iters = 3)
      .orderBy("iter").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "w", "e", 6L, 11L),
      (2L, "l", "o", 5L, 12L),
      (3L, "s", "t", 5L, 11L)))
  }

  test("bpeMerges stops early when the dictionary runs out of pairs") {
    val d = docsDF(1L -> "a b a b c") // single-char words: one round of pairs, then none
    val got = Corpus.bpeMerges(d, "text", iters = 5).collect()
    assert(got.isEmpty) // every word is one symbol — no adjacent pairs at all
  }

  test("sourceDivergence: skewed source diverges, representative source doesn't") {
    import spark.implicits._
    // corpus = 3 sources; a and b share the corpus-wide distribution,
    // c is all one word — c must carry the largest KL
    val d = Seq(
      ("a", "x y z x y z"), ("b", "x y z x y z"),
      ("c", "q q q q q q")).toDF("source", "text")
    val got = Corpus.sourceDivergence(d, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("a", "b", "c"))
    assert(got("a") == got("b")) // identical distributions, identical report
    assert(got("a")._1 == 6L && got("a")._2 == 3L)
    // a: P(x)=1/3 vs Q(x)=4/18=2/9 → KL = ln(3/2) > 0; exact quantized value
    val expectedA = (6L * math.floor(math.log((2.0 * 18.0) / (4.0 * 6.0)) * 1e6 + 0.5).toLong) / 6L
    assert(got("a")._3 == expectedA)
    // c: KL = ln(18/6) = ln 3 — the outlier
    assert(got("c")._3 == math.floor(math.log((6.0 * 18.0) / (6.0 * 6.0)) * 1e6 + 0.5).toLong)
    assert(got("c")._3 > got("a")._3)
  }

  test("bpeFertility scores symbols per word under the learned merges") {
    val d = docsDF(
      1L -> "low low low lower lower",
      2L -> "newest newest newest newest widest")
    // segmentations: low→2 syms, lower→3, newest→4, widest→5
    // doc 1: 5 tokens, 3·2+2·3=12 symbols → 2400; doc 2: 5 tokens, 4·4+5=21 → 4200
    val got = Corpus.bpeFertility(d, "doc_id", "text", iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((5L, 12L, 2400L)))
    assert(got(2L) == ((5L, 21L, 4200L)))
  }

  test("bpeVocab reports the post-merge segmentation") {
    val d = docsDF(
      1L -> "low low low lower lower",
      2L -> "newest newest newest newest widest")
    // after (w,e), (l,o), (s,t): low→[lo,w] lower→[lo,we,r]
    // newest→[n,e,we,st] widest→[w,i,d,e,st]
    val got = Corpus.bpeVocab(d, "text", iters = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "d" -> ((1L, 1L)), "e" -> ((2L, 5L)), "i" -> ((1L, 1L)),
      "lo" -> ((2L, 5L)), "n" -> ((1L, 4L)), "r" -> ((1L, 2L)),
      "st" -> ((2L, 5L)), "w" -> ((2L, 4L)), "we" -> ((2L, 6L))))
  }

  test("knBigram: hand-computed KN probabilities; continuation beats raw frequency") {
    // "san francisco" glues francisco to one left context; "the" precedes
    // many words — KN's continuation term must separate them
    val d = docsDF(
      1L -> "san francisco the cat san francisco the dog",
      2L -> "san francisco the fish the cat the dog")
    val out = Corpus.knBigram(d, "doc_id", "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("t1"),
          r.getAs[Long]("r2"), r.getAs[Long]("pkn_ppm"))).toMap
    // hand recompute every emitted cell from the corpus bigram multiset
    val toks = Seq("san francisco the cat san francisco the dog",
      "san francisco the fish the cat the dog").map(_.split(" ").toSeq)
    val bigrams = toks.flatMap(t => t.zip(t.drop(1)))
    val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val t1 = c12.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val r2 = c12.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val rTot = c12.size.toLong
    assert(out.keySet == c12.keySet)
    out.foreach { case ((w1, w2), (gc12, gc1, gt1, gr2, gppm)) =>
      assert((gc12, gc1, gt1, gr2) == (c12((w1, w2)), c1(w1), t1(w1), r2(w2)))
      val num = BigInt(math.max(4 * gc12 - 3, 0)) * rTot + BigInt(3) * gt1 * gr2
      val den = BigInt(4) * gc1 * rTot
      assert(gppm == (num * 1000000 / den).toLong, s"($w1,$w2)")
    }
    // francisco: frequent (3×) but follows ONLY san → r2 = 1 keeps its
    // continuation share minimal; cat follows the twice with r2 = 1 too,
    // but san→francisco is near-deterministic: P(francisco|san) ≈ 1
    assert(out(("san", "francisco"))._5 > 700000L)
  }
}
