package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps._

/** Corpus-curation operators a training-data pipeline runs between raw
  * crawl and tokenizer: term weighting (TF-IDF, BM25), repetition/quality
  * gating (Gopher-style rules), deterministic stratified sampling, document
  * packing into fixed-length training sequences, and benchmark
  * decontamination.
  *
  * Scale design:
  *   - Every operator is per-document or per-(document, term) aggregation —
  *     shuffles key on doc id or term, never on document text.
  *   - Corpus-level scalars (doc count, total length) ride a broadcast
  *     1-row frame into the plan: no driver-side `count()` action, so each
  *     operator stays a single lazily-planned DataFrame.
  *   - All windows are partitioned (by stratum / shard / doc) — no global
  *     single-partition window anywhere.
  *   - Decontamination broadcasts the held-out set's n-gram index (eval
  *     suites are tiny next to a crawl) so the probe is a map-side
  *     broadcast join against 100 TB of corpus grams.
  *   - Cross-engine determinism: ratios are single IEEE divisions of exact
  *     integers (correctly rounded, bit-equal on any engine); the one
  *     transcendental (ln in IDF) is quantized to 1e-6 before it reaches a
  *     hash gate or a rank order, and per-term contributions are summed as
  *     QUANTIZED integers so addition order cannot change the result.
  */
object Corpus {

  /** Tall per-document term frequencies: (id, w, tf). */
  private def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))

  /** 1-row broadcast frame with the corpus doc count (plan-level scalar). */
  private def corpusN(docs: DataFrame, idCol: String): DataFrame =
    broadcast(docs.agg(count(col(idCol)).as("n_docs")))

  /** Top-k TF-IDF terms per document: tf · (ln((N+1)/(df+1)) + 1),
    * quantized ×1e6 to a BIGINT (`tfidf_q`) — the rank order and the hash
    * gate both use the quantized value, so a last-ulp `ln` difference
    * between engines cannot reorder ties. Returns (id, rank, w, tf, df,
    * tfidf_q). */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val df_ = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val scored = tf.join(df_, "w")
      .crossJoin(corpusN(docs, idCol))
      .withColumn("tfidf_q",
        floor(col("tf").cast("double") *
          (log((col("n_docs").cast("double") + 1.0) / (col("df").cast("double") + 1.0)) + 1.0) *
          1000000.0 + 0.5).cast("long"))
    scored
      .withColumn("rank",
        row_number().over(Window.partitionBy("id").orderBy(col("tfidf_q").desc, col("w"))))
      .filter(col("rank") <= k)
      .select("id", "rank", "w", "tf", "df", "tfidf_q")
  }

  /** Sparse TF-IDF cosine k-NN via an inverted-index join — the SCALABLE
    * text-similarity search (the sparse complement of the dense-embedding
    * ANN surface): document vectors live as (id, term, weight) postings,
    * and the candidate dot products come from a postings-list equi-join on
    * the term, never an all-pairs comparison. Terms appearing in more than
    * `maxDfPct` percent of documents are dropped first — the classic
    * stopword/posting-length cut that bounds the join's fan-out (a term in
    * f docs contributes f·|q| pairs; capping df caps the quadratic tail,
    * exactly what makes this shape survive a 100 TB corpus where "the"
    * would otherwise join everything with everything). The cut is RELATIVE
    * (integer cross-multiply df·100 ≤ n_docs·pct) so the operating point
    * is corpus-size-invariant.
    *
    * Determinism: weights are the ×1e6-quantized [[tfidfTopK]] scores, so
    * dots and squared norms are exact 64-bit integer sums (order-free);
    * cosine is one IEEE divide of exacts, rounded to 12 dp only in the
    * output, ties broken by neighbor id — the q27 ranking rule.
    *
    * Scale: two shuffles on the term (df + join) and one on the pair key;
    * the rank window is partitioned by query id. Query postings are the
    * `queryPred` slice — broadcast-sized by construction.
    * Returns (id, rank, neighbor_id, n_shared_terms, cosine). */
  def tfidfKnn(docs: DataFrame, idCol: String, textCol: String, k: Int,
      maxDfPct: Int, queryPred: Column): DataFrame = {
    require(maxDfPct > 0 && maxDfPct <= 100,
      s"maxDfPct must be in (0, 100], got $maxDfPct")
    val tf = termFreqs(docs, idCol, textCol)
    val df_ = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val postings = tf.join(df_, "w")
      .crossJoin(corpusN(docs, idCol))
      .filter(col("df") * 100 <= col("n_docs") * maxDfPct)
      .withColumn("wt",
        floor(col("tf").cast("double") *
          (log((col("n_docs").cast("double") + 1.0) / (col("df").cast("double") + 1.0)) + 1.0) *
          1000000.0 + 0.5).cast("long"))
      .select("id", "w", "wt")
    val nrm = postings.groupBy("id")
      .agg(sqrt(sum(col("wt") * col("wt")).cast("double")).as("nrm"))
    val q = postings.filter(queryPred)
      .select(col("id").as("qid"), col("w"), col("wt").as("qwt"))
    val dots = broadcast(q)
      .join(postings.select(col("id").as("cid"), col("w"), col("wt").as("cwt")), "w")
      .filter(col("qid") =!= col("cid"))
      .groupBy("qid", "cid")
      .agg(sum(col("qwt") * col("cwt")).as("dot"),
        count(lit(1)).as("n_shared_terms"))
    dots
      .join(nrm.select(col("id").as("qid"), col("nrm").as("qn")), "qid")
      .join(nrm.select(col("id").as("cid"), col("nrm").as("cn")), "cid")
      .withColumn("cosine",
        round(col("dot").cast("double") / (col("qn") * col("cn")), 12))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))))
      .filter(col("rank") <= k)
      .select(col("qid").as("id"), col("rank"), col("cid").as("neighbor_id"),
        col("n_shared_terms"), col("cosine"))
  }

  /** BM25 (Robertson/Sparck Jones) relevance of every document against a
    * fixed bag of query terms. Per-term contributions quantize ×1e6 to
    * BIGINT before the final sum, so the score is an integer sum —
    * addition-order independent and engine-exact. Docs matching no term are
    * absent. Returns (id, n_terms_hit, score_q). */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    // corpus scalars (N, avgdl) in ONE broadcast row — avgdl as the exact
    // division of two integer aggregates
    val stats = broadcast(
      tf.agg(count_distinct(col("id")).as("n_docs"), sum("tf").as("total_len")))
    val qtf = tf.filter(col("w").isin(terms: _*)) // term filter FIRST: tiny frame
    val df_ = qtf.groupBy("w").agg(count(lit(1)).as("df"))
    // literal arithmetic stays inside the expression (lit(k1) + 1.0, not the
    // pre-folded Scala constant) so the oracle SQL can spell the SAME ieee
    // operation sequence and produce bit-equal doubles
    qtf.join(df_, "w").join(dl, "id").crossJoin(stats)
      .withColumn("avgdl", col("total_len").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib_q",
        floor(col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl").cast("double") / col("avgdl"))) *
          1000000.0 + 0.5).cast("long"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms_hit"), sum("contrib_q").as("score_q"))
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty,
    * SIGIR'01) — the language-modeling alternative to [[bm25]]:
    * score(d,q) = Σ_t ln((tf_{t,d} + μ·p_c(t)) / (dl_d + μ)), INCLUDING
    * zero-tf terms (the smoothing is the point — absent terms cost
    * ln(μ·p_c(t)/(dl+μ)), so verbose documents aren't free). Every log
    * argument is assembled as ONE exact-integer ratio —
    * (tf·total + μ·cnt_t) / (total·(dl + μ)) — so both engines feed `ln`
    * the identical double; contributions are quantized ×1e6 before the
    * sum (the q55/q59 rule). Query terms must occur in the corpus
    * (p_c = 0 has no defined log-likelihood).
    *
    * Shape: the doc×term grid is |docs|·|terms| rows (terms is a literal
    * handful — linear, not a blow-up); term stats and the corpus total
    * broadcast. Returns (id, n_terms_hit, score_q). */
  def dirichletQl(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], mu: Long = 2000L): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    val cnt = broadcast(tf.filter(col("w").isin(terms: _*))
      .groupBy("w").agg(sum("tf").as("cnt")))
    val total = broadcast(tf.agg(sum("tf").as("total")))
    docs.select(col(idCol).as("id")).crossJoin(cnt)
      .join(tf.filter(col("w").isin(terms: _*)), Seq("id", "w"), "left")
      .na.fill(0L, Seq("tf"))
      .join(dl, Seq("id"), "left")
      .na.fill(0L, Seq("dl"))
      .crossJoin(total)
      .withColumn("contrib_q",
        floor(log((col("tf") * col("total") + lit(mu) * col("cnt")).cast("double") /
            (col("total") * (col("dl") + lit(mu))).cast("double")) *
          1000000.0 + 0.5).cast("long"))
      .groupBy("id")
      .agg(sum(when(col("tf") > 0, 1L).otherwise(0L)).as("n_terms_hit"),
        sum("contrib_q").as("score_q"))
  }

  /** Gopher-style repetition/quality gate. Per document:
    *   - n_words, mean word length (alnum chars / words),
    *   - top_word_char_frac: the largest share of the doc's token characters
    *     held by ONE repeated word (a max aggregate — no argmax ties),
    *   - n_stop_distinct: distinct hits in a tiny function-word lexicon.
    * `pass` = word count in [minWords, maxWords] ∧ mean word length in
    * [3, 10] ∧ top_word_char_frac ≤ maxTopWordCharFrac ∧ ≥ 2 distinct stop
    * words. All ratios are single divisions of exact integers. */
  def qualityRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 30, maxWords: Int = 100000,
      maxTopWordCharFrac: Double = 0.14): DataFrame = {
    val stop = Seq("the", "a", "of", "to", "and")
    val perWord = termFreqs(docs, idCol, textCol)
      .withColumn("chars", col("tf") * length(col("w")))
    perWord.groupBy("id").agg(
        sum("tf").as("n_words"),
        sum("chars").as("n_token_chars"),
        max("chars").as("top_word_chars"),
        count_distinct(when(col("w").isin(stop: _*), col("w"))).as("n_stop_distinct"))
      .withColumn("mean_word_len",
        col("n_token_chars").cast("double") / col("n_words").cast("double"))
      .withColumn("top_word_char_frac",
        col("top_word_chars").cast("double") / col("n_token_chars").cast("double"))
      .withColumn("pass",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("top_word_char_frac") <= maxTopWordCharFrac &&
          col("n_stop_distinct") >= 2)
      .select("id", "n_words", "mean_word_len", "top_word_char_frac",
        "n_stop_distinct", "pass")
  }

  /** Deterministic stratified sampling: within each stratum, rank documents
    * by a multiplicative integer hash of their id and keep the first
    * ⌈rate · stratum size⌉ — an EXACT per-stratum fraction (hash-mod
    * sampling only hits the rate in expectation), reproducible across
    * engines and runs. The rank window partitions by stratum — at 100 TB
    * each stratum sorts independently; no global order. `rate` is a
    * percentage (integer, 1..100) so the quota ⌈cnt·rate/100⌉ stays in
    * integer arithmetic. Returns kept rows (stratum, id, smp_rank). */
  def sampleStratified(docs: DataFrame, idCol: String, strataCol: String,
      ratePct: Int): DataFrame = {
    val h = pmod(col(idCol).cast("long") * 2654435761L + 40503L, lit(P)).as("h")
    // both windows share one partitioning (one shuffle, one WindowExec)
    docs.select(col(strataCol).as("stratum"), col(idCol).as("id"), h)
      .withColumn("smp_rank",
        row_number().over(Window.partitionBy("stratum").orderBy("h", "id")))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("stratum")))
      // smp_rank ≤ ⌈cnt·rate/100⌉, kept in integer arithmetic
      .filter(col("smp_rank") * 100 <= col("cnt") * ratePct + 99)
      .select("stratum", "id", "smp_rank")
  }

  /** Document packing: concatenate each shard's documents (in id order) and
    * chunk the token stream into fixed-length training sequences. Emits the
    * placement of every document: (id, shard, seq_id, offset, n_tokens)
    * where seq_id/offset locate the document's first token. One exclusive
    * prefix-sum window per shard — shards pack independently, so
    * parallelism is the shard count and a 100 TB corpus packs with
    * thousands of shards and zero cross-shard coordination. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, nShards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("id"),
        pmod(col(idCol).cast("long"), lit(nShards.toLong)).as("shard"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("excl", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("id"), col("shard"),
        expr(s"excl div $seqLen").as("seq_id"),
        pmod(col("excl"), lit(seqLen.toLong)).as("offset"),
        col("n_tokens"))
  }

  /** Unigram log-probability scoring — the perplexity-style quality filter
    * of crawl curation (docs whose tokens are improbable under a language
    * model trained on the corpus itself are gibberish/boilerplate
    * candidates). For every document: n_words, Σ over token occurrences of
    * the quantized unigram log-prob lp_q(w) = ⌊ln(cnt(w)/total)·10^6 + 0.5⌋,
    * and a pass flag sum_lp_q ≥ threshold·n_words — the avg-logprob gate
    * expressed as an INTEGER cross-multiplication (no integer division,
    * whose negative-operand rounding differs across engines).
    *
    * Scale: two aggregations (corpus counts by term, doc sums by id) plus
    * one broadcast scalar — the same shuffle shape as TF-IDF. The model
    * here is the corpus's own unigram distribution; scoring against an
    * external reference model is the same dataflow with `cnt` loaded
    * instead of aggregated. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      minAvgLpQ: Long = -3430000L): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val cnt = tf.groupBy("w").agg(sum("tf").as("cnt"))
    val tot = broadcast(cnt.agg(sum("cnt").as("total")))
    tf.join(cnt, "w").crossJoin(tot)
      .withColumn("lp_q",
        floor(log(col("cnt").cast("double") / col("total").cast("double"))
          * 1000000.0 + 0.5).cast("long"))
      .groupBy("id")
      .agg(sum("tf").as("n_words"), sum(col("tf") * col("lp_q")).as("sum_lp_q"))
      .withColumn("pass_ppl", col("sum_lp_q") >= lit(minAvgLpQ) * col("n_words"))
  }

  /** DSIR-style importance weighting (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score every
    * document by how target-like its unigram distribution is,
    * w(doc) = Σ_t tf_t · ln(p̂_target(t) / p̂_raw(t)), with add-one smoothed
    * estimates p̂(t) = (cnt(t)+1)/(total+V). Selection keeps documents whose
    * aggregate log-ratio is ≥ 0 (more target-like than raw-like) — the
    * importance-resampling criterion with the noise draw dropped, which
    * keeps the gate deterministic.
    *
    * Determinism: the log-ratio is ONE `ln` of ONE double — the ratio
    * ((cnt_t+1)·(T_r+V)) / ((cnt_r+1)·(T_t+V)) with the products taken in
    * DOUBLE arithmetic (the q108 rule: int64 products overflow once corpus
    * totals reach ~1e13 tokens; IEEE doubles round identically on every
    * engine) — quantized ×1e6 half-up to a BIGINT before any per-doc
    * summation, so engines can never disagree by an ulp-ordering (the
    * q55/q71 rule).
    *
    * Scale: ONE term-frequency shuffle serves both distributions (the
    * target count is a conditional re-aggregation of the same tf rows, not
    * a second corpus pass); corpus scalars ride a broadcast 1-row frame;
    * the per-doc reduce keys on the doc id. At 100 TB the only state that
    * grows is the (term → counts) table — the same footprint as TF-IDF.
    * Returns (id, n_tokens, dsir_q, keep) — one row per tokenizable doc. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), isTarget.as("tgt"),
        explode(tokens(col(textCol))).as("w"))
      .groupBy("id", "tgt", "w").agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy("w").agg(
      sum("tf").as("cnt_r"),
      sum(when(col("tgt"), col("tf")).otherwise(0L)).as("cnt_t"))
    val scal = broadcast(cnt.agg(
      sum("cnt_r").as("tot_r"), sum("cnt_t").as("tot_t"),
      count(lit(1)).as("vocab")))
    tf.join(cnt, "w").crossJoin(scal)
      .withColumn("lp_q", floor(
        log(((col("cnt_t") + 1).cast("double")
          * (col("tot_r") + col("vocab")).cast("double"))
          / ((col("cnt_r") + 1).cast("double")
            * (col("tot_t") + col("vocab")).cast("double")))
          * 1000000.0 + 0.5).cast("long"))
      .groupBy("id")
      .agg(sum("tf").as("n_tokens"), sum(col("tf") * col("lp_q")).as("dsir_q"))
      .withColumn("keep", col("dsir_q") >= 0)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
    * each language's documents are scored against THAT language's unigram
    * distribution (the per-language LM proxy), ranked by average
    * log-probability, and cut into `nTiles` equal tiers per language —
    * head/middle/tail at nTiles=3, where CCNet trains on head+middle and
    * drops the tail. Keeping the cut per-language is the point: a flat
    * corpus-wide cut would mostly rank languages, not quality.
    *
    * Determinism: ranks order by the IEEE quotient of two exact integers
    * (identical on every engine) with the doc id as tiebreak; the emitted
    * columns are all integers/strings. `ntile` is the SQL-standard
    * distribution (first buckets take the remainder rows) on both engines.
    *
    * Scale: per-language term counts and totals are one aggregation tree
    * over the same tf shuffle as TF-IDF; the tier window partitions by
    * language — never a global sort. Language totals are a |langs|-row
    * broadcast. Returns (id, lang, n_words, sum_lp_q, bucket, tier). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, nTiles: Int = 3): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), col(langCol).as("lang"),
        explode(tokens(col(textCol))).as("w"))
      .groupBy("id", "lang", "w").agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy("lang", "w").agg(sum("tf").as("cnt"))
    val tot = cnt.groupBy("lang").agg(sum("cnt").as("total"))
    val w = Window.partitionBy(col("lang"))
      .orderBy((col("sum_lp_q").cast("double") / col("n_words").cast("double")).desc,
        col("id"))
    tf.join(cnt, Seq("lang", "w"))
      .join(broadcast(tot), "lang")
      .withColumn("lp_q",
        floor(log(col("cnt").cast("double") / col("total").cast("double"))
          * 1000000.0 + 0.5).cast("long"))
      .groupBy("id", "lang")
      .agg(sum("tf").as("n_words"), sum(col("tf") * col("lp_q")).as("sum_lp_q"))
      .withColumn("bucket", ntile(nTiles).over(w).cast("long"))
      .withColumn("tier", when(col("bucket") === 1, "head")
        .when(col("bucket") === nTiles, "tail").otherwise("middle"))
      .select("id", "lang", "n_words", "sum_lp_q", "bucket", "tier")
  }

  /** PMI phrase mining (the word2phrase pass of Mikolov et al.,
    * "Distributed Representations of Words and Phrases", NeurIPS 2013,
    * scored as pointwise mutual information): adjacent-token bigrams whose
    * co-occurrence beats the independence baseline,
    * PMI(a,b) = ln(p(ab) / (p(a)·p(b))) with p over the corpus's own
    * unigram/bigram totals. Tokenizer prep: bigrams with cnt ≥ `minCount`
    * and PMI ≥ threshold become single tokens before vocabulary training.
    *
    * Determinism: the PMI ratio multiplies counts as DOUBLES in one fixed
    * association order — the products can exceed int64 at corpus scale, and
    * IEEE double arithmetic is identically rounded on every engine — then
    * quantizes ×1e6 half-up to a BIGINT (the q55/q71 rule).
    *
    * Scale: bigram extraction is a scan-stage generator (no join against
    * shifted positions); one (w1, w2) count shuffle + one unigram count
    * shuffle (TF-IDF's footprint); corpus totals ride a broadcast 1-row
    * frame. Returns (w1, w2, cnt_big, cnt_w1, cnt_w2, pmi_q, is_phrase)
    * for bigrams with cnt_big ≥ minCount. */
  /** Adjacent-token bigram occurrences (id, w1, w2) from an (id, t) token
    * frame — the scan-stage generator shared by [[pmiPhrases]] and
    * [[bigramLogProb]] (and mirrored by both oracles' UNNEST(range)). */
  private def bigramPairs(toks: DataFrame): DataFrame =
    toks.filter(size(col("t")) >= 2)
      .select(col("id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> " +
          "struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))")).as("p"))
      .select(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  def pmiPhrases(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long, minPmiQ: Long): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
    val bg = bigramPairs(toks).groupBy("w1", "w2").agg(count(lit(1)).as("cnt_big"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val scal = broadcast(uni.agg(sum("cnt").as("tot_uni"))
      .crossJoin(bg.agg(sum("cnt_big").as("tot_big"))))
    bg.filter(col("cnt_big") >= minCount)
      .join(uni.select(col("w").as("w1"), col("cnt").as("cnt_w1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cnt").as("cnt_w2")), "w2")
      .crossJoin(scal)
      .withColumn("pmi_q", floor(log(
        (col("cnt_big").cast("double") * col("tot_uni").cast("double")
          * col("tot_uni").cast("double"))
          / (col("cnt_w1").cast("double") * col("cnt_w2").cast("double")
            * col("tot_big").cast("double")))
        * 1000000.0 + 0.5).cast("long"))
      .withColumn("is_phrase", col("pmi_q") >= minPmiQ)
      .select("w1", "w2", "cnt_big", "cnt_w1", "cnt_w2", "pmi_q", "is_phrase")
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman 1999) at the canonical discount D = 0.75, in EXACT
    * integer arithmetic: with c12 the bigram count, c1 = Σ_w c(w1,w),
    * T1 = |{w : c(w1,w) > 0}| (continuation types after w1),
    * R2 = |{v : c(v,w2) > 0}| (left-context types before w2) and R the
    * distinct-bigram total,
    *   P_KN(w2|w1) = max(c12 − D, 0)/c1 + (D·T1/c1)·(R2/R),
    * and multiplying through by 4 clears the one rational discount:
    *   pkn_ppm = ⌊1e6·(max(4·c12 − 3, 0)·R + 3·T1·R2) / (4·c1·R)⌋ —
    * no floats anywhere, so the smoothed LM hash-gates. The continuation
    * probability R2/R (novel-context propensity, NOT raw frequency) is
    * what distinguishes KN from the q110 interpolated-count model.
    * Numerator and denominator ride DECIMAL(38,0) (HUGEINT in the
    * oracle) — 4·c12·R passes int64 once the distinct-bigram space does.
    * Scale: three hash aggregates over the bigram stream (all map-side
    * combinable) + two key joins + a 1-row broadcast; nothing pairwise,
    * no windows. Returns (w1, w2, c12, c1, t1, r2, pkn_ppm) for bigrams
    * with c12 ≥ minCount. */
  def knBigram(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
    val bg = bigramPairs(toks).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val left = bg.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("t1"))
    val right = bg.groupBy("w2").agg(count(lit(1)).as("r2"))
    val scal = broadcast(bg.agg(count(lit(1)).as("r")))
    bg.filter(col("c12") >= minCount)
      .join(left, "w1").join(right, "w2")
      .crossJoin(scal)
      .withColumn("pkn_ppm", expr(graft.operators.Analytics.floorDivScaledSql(
        "greatest(4 * c12 - 3, 0L) * CAST(r AS DECIMAL(38,0)) " +
          "+ 3 * t1 * CAST(r2 AS DECIMAL(38,0))",
        "4 * c1 * CAST(r AS DECIMAL(38,0))", 1000000L)))
      .select("w1", "w2", "c12", "c1", "t1", "r2", "pkn_ppm")
  }

  /** Deterministic mixture-curriculum scheduler: a single global training
    * order in which every source's documents are spread evenly — source s's
    * i-th document (under a per-source LCG-hash shuffle) is emitted at
    * virtual time i / w_s, with w_s = ⌊√n_s · 10⁶⌋ the same
    * integer-temperature weight as [[sampleTemperature]] (stride
    * scheduling, the deterministic analogue of sampling-without-replacement
    * from a weighted mixture). The trainer then streams position order and
    * sees sources interleaved ∝ weight instead of concatenated — no RNG,
    * so the schedule is reproducible and resumable from any position.
    *
    * Determinism: within-source order is the integer LCG rank; virtual
    * times are IEEE quotients of exact integers (identical on every
    * engine), tie-broken by (source, id).
    *
    * Scale: one per-source rank window (partitioned, never global), a
    * |sources|-row broadcast for weights, and the global position from
    * [[graft.operators.Ranks.globalRank]] — the distributed
    * zip-with-index, no single-partition window anywhere. Returns
    * (id, source, src_rank, n_src, position). */
  def mixtureSchedule(docs: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val ranked = docs
      .select(col(sourceCol).as("source"), col(idCol).as("id"),
        pmod(col(idCol).cast("long") * 2654435761L + 40503L, lit(P)).as("h"))
      .withColumn("src_rank", row_number()
        .over(Window.partitionBy("source").orderBy("h", "id")).cast("long"))
    val wts = ranked.groupBy("source").agg(count(lit(1)).as("n_src"))
      .withColumn("w", floor(sqrt(col("n_src").cast("double")) * 1000000.0).cast("long"))
    val vt = ranked.join(broadcast(wts), "source")
      .withColumn("vtime", col("src_rank").cast("double") / col("w").cast("double"))
    graft.operators.Ranks.globalRank(vt, "position",
      col("vtime"), col("source"), col("id"))
      .select("id", "source", "src_rank", "n_src", "position")
  }

  /** Interpolated bigram language-model scoring — the next LM rung above
    * [[unigramLogProb]]'s unigram proxy (Jelinek-Mercer smoothing, λ=1/2):
    * p̂(w_i | w_{i−1}) = ½·cnt(w_{i−1}w_i)/cnt(w_{i−1}) + ½·cnt(w_i)/T.
    * Doc score = Σ over bigram positions of the ×1e6-quantized ln p̂;
    * `pass_ppl` gates on the average via the same integer cross-multiply
    * as the unigram form (never a division on the gate path).
    *
    * Determinism: each distinct bigram's log-prob is quantized ONCE (two
    * IEEE quotients + one ln, in fixed order), then per-doc sums are
    * integer arithmetic — the q55/q71 rule.
    *
    * Scale: bigram extraction is the same scan-stage generator as
    * [[pmiPhrases]]; one (id,w1,w2) shuffle, one (w1,w2) count, unigram
    * counts joined in, corpus total broadcast. Single-token docs have no
    * bigrams and drop out (exactly as tokenless docs do in the unigram
    * form). Returns (id, n_bigrams, sum_blp_q, pass_ppl). */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      minAvgLpQ: Long): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
    val tfb = bigramPairs(toks).groupBy("id", "w1", "w2").agg(count(lit(1)).as("tfb"))
    val cb = tfb.groupBy("w1", "w2").agg(sum("tfb").as("cnt_big"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = broadcast(uni.agg(sum("cnt").as("total")))
    val lp = cb
      .join(uni.select(col("w").as("w1"), col("cnt").as("cnt_w1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cnt").as("cnt_w2")), "w2")
      .crossJoin(tot)
      .withColumn("blp_q", floor(log(
        lit(0.5) * (col("cnt_big").cast("double") / col("cnt_w1").cast("double"))
          + lit(0.5) * (col("cnt_w2").cast("double") / col("total").cast("double")))
        * 1000000.0 + 0.5).cast("long"))
      .select("w1", "w2", "blp_q")
    tfb.join(lp, Seq("w1", "w2"))
      .groupBy("id")
      .agg(sum("tfb").as("n_bigrams"), sum(col("tfb") * col("blp_q")).as("sum_blp_q"))
      .withColumn("pass_ppl", col("sum_blp_q") >= lit(minAvgLpQ) * col("n_bigrams"))
  }

  /** Fractional containment decontamination — the graded form of
    * [[decontaminate]]: instead of flagging any shared n-gram, score each
    * corpus document by WHAT SHARE of its distinct n-grams appear anywhere
    * in the eval set, containment = |S(doc) ∩ S(eval)| / |S(doc)| (the
    * asymmetric overlap of Broder's resemblance family — right for
    * "my training doc quotes the benchmark", where the doc may be much
    * longer than the quoted item). The gate is the exact integer
    * cross-multiply n_shared·100 ≥ n_grams·thresholdPct.
    *
    * Scale: same asymmetry as [[decontaminate]] — the eval gram set (small
    * by construction) broadcasts; corpus grams never shuffle for the
    * probe. Every corpus doc with ≥n tokens gets a row (left join), so
    * clean docs are auditable, not absent. Returns
    * (id, n_grams, n_shared, contaminated). */
  def decontaminateContainment(corpus: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int, thresholdPct: Int): DataFrame = {
    val corpusGrams = Dedup.shingleIndex(corpus, idCol, textCol, n)
    val sizes = corpusGrams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val evalGrams = Dedup.shingleIndex(eval, idCol, textCol, n)
      .select("s").distinct()
    val inter = corpusGrams.join(broadcast(evalGrams), "s")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
    sizes.join(inter, Seq("id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("contaminated",
        col("n_shared") * 100 >= col("n_grams") * thresholdPct)
  }

  /** Corpus vocabulary report — the Zipf sanity check a curation run
    * prints before tokenizer training: the top-k tokens by frequency
    * alongside corpus-level scalars (vocabulary size, hapax-legomenon
    * count, total token occurrences). A skewed head or a hapax explosion
    * flags boilerplate or encoding damage before they poison a tokenizer.
    *
    * Scale: one (term) aggregation; top-k via TakeOrdered (never a global
    * sort); ranks by triangular join on the k-row frame (no unpartitioned
    * window); scalars ride a broadcast 1-row frame. Returns k rows
    * (rank, w, cnt, vocab_size, n_hapax, total_tokens). */
  def vocabReport(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val cnt = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val scalars = broadcast(cnt.agg(
      count(lit(1)).as("vocab_size"),
      sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"),
      sum("cnt").as("total_tokens")))
    val top = cnt.orderBy(col("cnt").desc, col("w")).limit(k)
    val ranked = top.as("a")
      .join(top.as("b"),
        col("b.cnt") > col("a.cnt") ||
          (col("b.cnt") === col("a.cnt") && col("b.w") < col("a.w")),
        "left")
      .groupBy(col("a.w").as("w"), col("a.cnt").as("cnt"))
      .agg((count(col("b.w")) + 1).cast("long").as("rank"))
    ranked.crossJoin(scalars)
      .select("rank", "w", "cnt", "vocab_size", "n_hapax", "total_tokens")
  }

  /** Temperature-based domain mixture sampling (the multilingual /
    * domain-reweighting recipe: p_d ∝ n_d^α with α = 1/2, which upweights
    * rare domains relative to proportional sampling). Each stratum gets an
    * integer quota ⌈targetN · w_d / W⌉ where w_d = ⌊√n_d · 10⁶⌋ — √ is
    * IEEE-correctly-rounded on every engine (a general pow(x, α) is NOT,
    * which is why α is fixed at 1/2), the ×10⁶ floor makes the weights
    * integers, so the quota arithmetic is exact cross-engine. Row selection
    * inside a stratum is the same deterministic LCG hash rank as
    * [[sampleStratified]].
    *
    * Scale: per-stratum windows (partitioned, never global), stratum
    * weights are a tiny aggregate broadcast back; one shuffle keyed on the
    * stratum. Returns (stratum, id, smp_rank, quota). */
  def sampleTemperature(docs: DataFrame, idCol: String, strataCol: String,
      targetN: Long): DataFrame = {
    val base = docs.select(col(strataCol).as("stratum"), col(idCol).as("id"),
      pmod(col(idCol).cast("long") * 2654435761L + 40503L, lit(P)).as("h"))
    val weights = base.groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_q", floor(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
    val total = broadcast(weights.agg(sum("w_q").as("w_total")))
    val quotas = broadcast(weights.crossJoin(total)
      .select(col("stratum"),
        expr("(cast(" + targetN + " as bigint) * w_q + w_total - 1) div w_total")
          .as("quota")))
    base
      .withColumn("smp_rank",
        row_number().over(Window.partitionBy("stratum").orderBy("h", "id")))
      .join(quotas, "stratum")
      .filter(col("smp_rank") <= col("quota"))
      .select("stratum", "id", "smp_rank", "quota")
  }

  /** Sliding-window chunking with overlap — the RAG/pretraining splitter:
    * token windows of `chunk` tokens starting every `stride` tokens
    * (overlap = chunk − stride), one chunk per start position < n_tokens,
    * the last chunk ragged. Token-array `slice` is a codegen'd builtin
    * (NOT an interpreted lambda HOF), and the whole operator is
    * scan + generate — no shuffle, no window. Returns
    * (id, chunk_idx, n_tok, chunk_sha). */
  def chunkSliding(docs: DataFrame, idCol: String, textCol: String,
      chunk: Int, stride: Int): DataFrame = {
    require(stride >= 1 && chunk >= stride,
      s"need chunk >= stride >= 1, got chunk=$chunk stride=$stride")
    docs.select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 1, lit(stride))).as("start"))
      .select(col("id"), (col("start") / stride).cast("long").as("chunk_idx"),
        slice(col("t"), col("start") + 1, lit(chunk)).as("ch"))
      .select(col("id"), col("chunk_idx"),
        size(col("ch")).cast("long").as("n_tok"),
        sha2(array_join(col("ch"), " ").cast("binary"), 256).as("chunk_sha"))
  }

  // PII patterns, redacted in priority order (email before phone/IP so a
  // user-part digit run can't be half-eaten by a later pattern). Java and
  // RE2 agree on this subset of syntax (classes, \d, \b, bounded repeats),
  // so the DuckDB oracle replicates matches byte-for-byte.
  val PiiPatterns: Seq[(String, String)] = Seq(
    """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}""" -> "<EMAIL>",
    """\b\d{3}-\d{2}-\d{4}\b""" -> "<ID>",
    """\b\d{3}-\d{3}-\d{4}\b""" -> "<PHONE>",
    """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""" -> "<IP>")

  /** PII scrubbing — the redaction pass a curation run applies before any
    * text leaves the raw zone: emails, SSN-shaped ids, phone numbers and
    * IPv4 literals replaced by typed tags, with per-class match counts for
    * the audit ledger. Counts are measured against the PRISTINE text (each
    * pattern independently — the four patterns cannot overlap-match the
    * same span); redaction applies them sequentially in priority order.
    *
    * Scale: pure per-row `regexp_replace`/`regexp_extract_all` column
    * expressions — whole-stage codegen, no shuffle, no UDF; the scan cost
    * IS the operator cost at 100 TB. Returns
    * (id, n_emails, n_ids, n_phones, n_ips, clean_text). */
  def scrubPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def n(re: String) = size(regexp_extract_all(t, lit(re), lit(0))).cast("long")
    val clean = PiiPatterns.foldLeft(t) {
      case (c, (re, tag)) => regexp_replace(c, re, tag)
    }
    docs.select(col(idCol).as("id"),
      n(PiiPatterns(0)._1).as("n_emails"),
      n(PiiPatterns(1)._1).as("n_ids"),
      n(PiiPatterns(2)._1).as("n_phones"),
      n(PiiPatterns(3)._1).as("n_ips"),
      clean.as("clean_text"))
  }

  /** Boilerplate / common-gram profiling: the fraction of a document's
    * distinct token n-grams that are corpus-common (document frequency ≥
    * `minDfPermille`‰ of the corpus). High ratios flag template text,
    * navigation chrome and word-salad spam; the per-gram document
    * frequencies double as the corpus's boilerplate lexicon.
    *
    * The threshold is a SHARE of the corpus (integer cross-multiply
    * `df·1000 ≥ permille·N`, no float), so the same setting means the same
    * thing at sf0.01 and at 100 TB. Scale: one shuffle keyed on the gram
    * to compute df, one keyed on doc id to fold back — the df frame joins
    * 1:many on the gram key with one row per gram on the build side, so a
    * high-df (boilerplate) gram skews only the probe side, which is
    * already spread across its df source partitions. Returns
    * (id, n_grams, n_boiler, boiler_ratio, flag_boiler). */
  def boilerplate(docs: DataFrame, idCol: String, textCol: String, n: Int,
      minDfPermille: Long, flagRatio: Double): DataFrame = {
    val sh = Dedup.shingleIndex(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val nDocs = corpusN(docs, idCol)
    sh.join(df, "s").crossJoin(nDocs)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") * 1000L >= lit(minDfPermille) * col("n_docs"), 1L)
          .otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_ratio",
        round(col("n_boiler").cast("double") / col("n_grams"), 12))
      .withColumn("flag_boiler", col("boiler_ratio") >= lit(flagRatio))
  }

  /** Deterministic train/val/test split by stable content-key hash — the
    * assignment every training pipeline needs to be reproducible across
    * reruns, engines and table rewrites: bucket = the first byte of
    * md5(id) (uniform over [0, 256)), split boundaries as integer
    * cross-multiplies of the percentage (no float thresholds). A document's
    * split never changes when the corpus grows — it depends only on its own
    * id — which is what keeps eval sets stable across crawl snapshots.
    *
    * Scale: one md5 per row, zero shuffles, zero joins — scan-speed. The
    * hex-nibble decode (`instr` over the hex alphabet) is the same
    * expression the DuckDB oracle runs, so assignments are byte-identical
    * cross-engine. Returns (id, bucket, split). */
  def hashSplit(docs: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    hashSplitBy(docs.select(col(idCol).as("id")), "id", trainPct, valPct)
      .select("id", "bucket", "split")

  /** [[hashSplit]] keyed on an arbitrary GROUP column, appended to the
    * input frame: every row whose `keyCol` matches gets the same split —
    * the LEAKAGE-SAFE form, where correlated rows (a near-dup cluster, a
    * URL host, a conversation) must never straddle train/eval. Same md5
    * hex-nibble arithmetic as [[hashSplit]]; still zero shuffles. */
  def hashSplitBy(df: DataFrame, keyCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct+valPct < 100; got $trainPct/$valPct")
    df.withColumn("hx", md5(col(keyCol).cast("string").cast("binary")))
      .withColumn("bucket",
        (expr("instr('0123456789abcdef', substring(hx, 1, 1)) - 1") * 16 +
          expr("instr('0123456789abcdef', substring(hx, 2, 1)) - 1")).cast("long"))
      .withColumn("split",
        when(col("bucket") * 100 < trainPct * 256, "train")
          .when(col("bucket") * 100 < (trainPct + valPct) * 256, "val")
          .otherwise("test"))
      .drop("hx")
  }

  /** Group-aware k-fold assignment (scikit-learn's GroupKFold, made
    * deterministic): every row whose `keyCol` matches lands in the same
    * fold — fold = md5-bucket(key) mod k, the same nibble arithmetic as
    * [[hashSplitBy]], so cross-validation folds never split a near-dup
    * cluster (or host, or conversation) across train/eval. Zero
    * shuffles; stable under corpus growth. */
  def kFoldBy(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 1 && k <= 256, s"need 1 < k <= 256; got $k")
    df.withColumn("hx", md5(col(keyCol).cast("string").cast("binary")))
      .withColumn("bucket",
        (expr("instr('0123456789abcdef', substring(hx, 1, 1)) - 1") * 16 +
          expr("instr('0123456789abcdef', substring(hx, 2, 1)) - 1")).cast("long"))
      .withColumn("fold", pmod(col("bucket"), lit(k.toLong)))
      .drop("hx")
  }

  /** Per-stratum token-budget cap — the mixture-quota primitive when the
    * quota is measured in TOKENS, not documents (how real mixtures are
    * specified: "at most B tokens of source d"). Documents are admitted
    * greedily in deterministic LCG-hash order until the budget is spent;
    * the last admitted document may overrun (admit-if-any-budget-remains),
    * so every stratum with data contributes at least one document.
    *
    * Scale: same shape as [[sampleStratified]] — one shuffle keyed on the
    * stratum, two windows (rank + exclusive prefix sum) sharing that one
    * partitioning; strata fill independently, no global coordination.
    * Returns admitted rows (stratum, id, smp_rank, n_tokens, cum_before). */
  def capTokenBudget(docs: DataFrame, idCol: String, strataCol: String,
      textCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy("stratum").orderBy("h", "id")
    docs.select(col(strataCol).as("stratum"), col(idCol).as("id"),
        pmod(col(idCol).cast("long") * 2654435761L + 40503L, lit(P)).as("h"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("smp_rank", row_number().over(w))
      .withColumn("cum_before",
        coalesce(sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .filter(col("cum_before") < budget)
      .select("stratum", "id", "smp_rank", "n_tokens", "cum_before")
  }

  /** Benchmark decontamination: flag corpus documents sharing any token
    * n-gram with a held-out evaluation set. The eval side's distinct grams
    * are BROADCAST (an eval suite is KBs–MBs against a 100 TB corpus), so
    * the probe is a map-side join on the corpus gram stream. Returns
    * (id, n_shared_grams) for contaminated documents only. */
  def decontaminate(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val corpusGrams = Dedup.shingleIndex(corpus, idCol, textCol, n)
    val evalGrams = Dedup.shingleIndex(eval, idCol, textCol, n)
      .select("s").distinct()
    corpusGrams.join(broadcast(evalGrams), "s")
      .groupBy("id").agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Per-stratum document cap ranked by QUALITY — the per-domain cap a web
    * pipeline applies against SEO/template farms: instead of admitting in
    * hash order ([[sampleStratified]]) or by token budget
    * ([[capTokenBudget]]), keep each stratum's `maxDocs` most
    * lexically-diverse documents. Diversity is the type–token ratio as an
    * EXACT integer: `ttr_q = (n_distinct · 1e6) div n_tokens` — integer
    * division of integer counts, bit-equal on any engine, so the rank
    * order (ttr_q desc, id) is total and portable.
    *
    * Scale: one scan computing both counts from a single tokenization, one
    * stratum-keyed shuffle, one partitioned rank window — strata cap
    * independently, a 100 TB crawl caps with millions of domains in
    * parallel and no global coordination. Returns the admitted rows
    * (stratum, id, n_tokens, n_distinct, ttr_q, q_rank). */
  def capPerStratum(docs: DataFrame, idCol: String, strataCol: String,
      textCol: String, maxDocs: Int): DataFrame = {
    require(maxDocs > 0, s"maxDocs must be positive, got $maxDocs")
    docs.select(col(strataCol).as("stratum"), col(idCol).as("id"),
        tokens(col(textCol)).as("t"))
      .select(col("stratum"), col("id"),
        size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("n_distinct"))
      .withColumn("ttr_q",
        when(col("n_tokens") > 0,
          expr("n_distinct * 1000000 div n_tokens")).otherwise(0L).cast("long"))
      .withColumn("q_rank", row_number()
        .over(Window.partitionBy("stratum").orderBy(col("ttr_q").desc, col("id"))))
      .filter(col("q_rank") <= maxDocs)
      .select("stratum", "id", "n_tokens", "n_distinct", "ttr_q", "q_rank")
  }

  /** Deterministic epoch shuffle — the global training-order permutation a
    * trainer consumes each epoch, plus the shard every example lands in.
    * Position is the rank of `md5(epoch ':' id)` (id tie-break): a seeded,
    * engine-portable permutation that changes completely between epochs
    * with zero RNG state, and is resumable from any position. Shards are
    * round-robin over the permuted order, so every shard sees an unbiased
    * slice of every epoch's order.
    *
    * Scale: one [[graft.operators.Ranks.globalRank]] per epoch — the
    * distributed zip-with-index (range repartition + per-partition
    * row_number + broadcast offsets), never a single-partition window; the
    * epochs are independent unioned plans. Returns
    * (epoch, id, position, shard). */
  def epochOrder(docs: DataFrame, idCol: String, epochs: Int,
      nShards: Int): DataFrame = {
    require(epochs > 0 && nShards > 0,
      s"epochs and nShards must be positive, got $epochs/$nShards")
    val base = docs.select(col(idCol).as("id"))
    (0 until epochs).map { ep =>
      val keyed = base.withColumn("epoch", lit(ep.toLong))
        .withColumn("k", md5(
          concat(lit(ep.toString), lit(":"), col("id").cast("string")).cast("binary")))
      graft.operators.Ranks.globalRank(keyed, "position", col("k"), col("id"))
        .withColumn("shard", pmod(col("position") - 1L, lit(nShards.toLong)))
        .select("epoch", "id", "position", "shard")
    }.reduce(_ union _)
  }

  // ------------------------------------------------------- BPE training

  /** Word dictionary with corpus counts, each word pre-segmented into
    * '_'-prefixed character symbols ("low" → "_l_o_w"; '_' cannot occur
    * inside a [a-z0-9]+ token, so "_a_b" only ever matches a symbol
    * BOUNDARY — substring collisions like "ax_y" ⊃ "x_y" are impossible).
    * Shared by [[bpeMerges]] and [[bpeVocab]]. */
  private def bpeDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .withColumn("syms", regexp_replace(col("word"), "(.)", "_$1"))

  /** Corpus-weighted adjacent symbol pairs of a (word, wc, syms) dictionary:
    * (lhs, rhs, cnt = Σ wc over occurrences, counting multiplicity). */
  private def bpePairCounts(dict: DataFrame): DataFrame =
    dict.withColumn("t", filter(split(col("syms"), "_"), x => x =!= ""))
      .filter(size(col("t")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> " +
          "struct(element_at(t, i) AS lhs, element_at(t, i + 1) AS rhs))")).as("p"))
      .groupBy("p.lhs", "p.rhs").agg(sum("wc").as("cnt"))

  /** One BPE training iteration: pick the most frequent adjacent symbol
    * pair (tie: lexicographic (lhs, rhs)) and merge every occurrence —
    * `replace` is left-to-right non-overlapping in Spark, DuckDB, and
    * Java alike, which IS greedy BPE merge application ("_a_a_a" under
    * merge (a,a) → "_aa_a"). Returns (merged dictionary, merge row or
    * None when no pairs remain). */
  private def bpeStep(dict: DataFrame): (DataFrame, Option[(String, String, Long, Long)]) = {
    val pairs = bpePairCounts(dict)
    val top = pairs.orderBy(desc("cnt"), asc("lhs"), asc("rhs")).limit(1).collect()
    if (top.isEmpty) (dict, None)
    else {
      val (l, r) = (top(0).getString(0), top(0).getString(1))
      val merged = dict.withColumn("syms",
        expr(s"replace(syms, '_${l}_${r}', '_${l}${r}')"))
      (merged, Some((l, r, top(0).getLong(2), pairs.count())))
    }
  }

  /** Distributed BPE merge mining — the tokenizer-training core: `iters`
    * rounds of (count corpus-weighted adjacent symbol pairs → merge the
    * most frequent pair everywhere). The classic byte-pair-encoding
    * algorithm, run over the WORD DICTIONARY weighted by corpus counts —
    * the standard trick that makes BPE tractable at scale: the corpus is
    * touched exactly once (one (word) aggregation over the token stream);
    * every iteration after that is vocabulary-scale, not corpus-scale.
    *
    * Determinism: pure integer counts; ties broken (cnt DESC, lhs, rhs);
    * merge application is engine-portable `replace` (see [[bpeStep]]).
    * The per-iteration top-pair collect is metadata-scale (1 row) — the
    * merge table IS the driver-side artifact BPE training produces.
    *
    * Returns one row per completed iteration (fewer than `iters` only
    * when the dictionary runs out of pairs):
    * (iter, lhs, rhs, pair_count, n_pairs). */
  def bpeMerges(docs: DataFrame, textCol: String, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = docs.sparkSession
    import spark.implicits._
    var dict = bpeDict(docs, textCol).persist()
    val out = Seq.newBuilder[(Long, String, String, Long, Long)]
    var it = 0
    var exhausted = false
    while (it < iters && !exhausted) {
      val (merged, m) = bpeStep(dict)
      m match {
        case Some((l, r, cnt, nPairs)) =>
          it += 1
          out += ((it.toLong, l, r, cnt, nPairs))
          dict = merged.persist() // next iteration re-reads the merged dictionary twice
        case None => exhausted = true
      }
    }
    out.result().toDF("iter", "lhs", "rhs", "pair_count", "n_pairs")
  }

  /** Post-merge symbol vocabulary — what the corpus looks like to a
    * tokenizer after `iters` BPE merges ([[bpeMerges]]): for every symbol
    * in the merged segmentation, the number of distinct dictionary words
    * containing it and its corpus occurrence count (multiplicity ×
    * word frequency). The coverage report a tokenizer run prints.
    *
    * Scale: same single corpus-scale (word) aggregation as [[bpeMerges]];
    * the vocabulary explode and (sym) aggregation are dictionary-scale.
    * Returns (sym, n_words, corpus_count). */
  def bpeVocab(docs: DataFrame, textCol: String, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    dictAfterMerges(docs, textCol, iters)
      .select(col("word"), col("wc"),
        explode(filter(split(col("syms"), "_"), x => x =!= "")).as("sym"))
      .groupBy("sym")
      .agg(countDistinct("word").as("n_words"), sum("wc").as("corpus_count"))
  }

  /** The word dictionary after `iters` [[bpeStep]] merges (stops early if
    * the dictionary runs out of pairs). */
  private def dictAfterMerges(docs: DataFrame, textCol: String,
      iters: Int): DataFrame = {
    var dict = bpeDict(docs, textCol).persist()
    var it = 0
    var exhausted = false
    while (it < iters && !exhausted) {
      val (merged, m) = bpeStep(dict)
      if (m.isEmpty) exhausted = true
      else { it += 1; dict = merged.persist() }
    }
    dict
  }

  /** Per-source distribution drift — KL(P_source ‖ P_corpus) over unigram
    * distributions, the outlier-domain detector a mixture pipeline runs
    * before trusting per-source weights: a source whose language model
    * diverges from the corpus (template farm, wrong language, binary
    * spill) shows a large divergence even when its per-doc quality scores
    * look fine. KL = Σ_w P_s(w)·ln(P_s(w)/Q(w)), reported in integer
    * micro-nats as (Σ_w cnt_s(w)·lq(w)) div n_s with
    * lq = round(ln((cnt_s·N)/(cnt·n_s))·1e6) — the weighted sum is exact
    * 64-bit integer arithmetic (order-free), and the log's argument
    * multiplies as DOUBLES in one fixed association order on both engines
    * (the q106/q108 overflow rule). Every source term has cnt ≥ cnt_s > 0,
    * so the log never sees zero.
    *
    * Scale: two term-keyed aggregations ((source, w) then (w)) and one
    * |sources|-row broadcast — TF-IDF's shuffle footprint; no shuffle
    * carries text beyond the tokens themselves. Returns
    * (source, n_tokens, n_distinct, kl_q). */
  def sourceDivergence(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val sw = docs.select(col(sourceCol).as("source"), explode(tokens(col(textCol))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("cnt_sw"))
    val cw = sw.groupBy("w").agg(sum("cnt_sw").as("cnt_w"))
    val ns = sw.groupBy("source").agg(sum("cnt_sw").as("n_s"),
      count(lit(1)).as("n_distinct"))
    val tot = broadcast(cw.agg(sum("cnt_w").as("n_tot")))
    sw.join(cw, "w").join(broadcast(ns), "source").crossJoin(tot)
      .withColumn("lq", floor(log(
        (col("cnt_sw").cast("double") * col("n_tot").cast("double"))
          / (col("cnt_w").cast("double") * col("n_s").cast("double")))
        * 1000000.0 + 0.5).cast("long"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"), max("n_distinct").as("n_distinct"),
        sum(col("cnt_sw") * col("lq")).as("sum_lq"))
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        expr("sum_lq div n_tokens").as("kl_q"))
  }

  /** Tokenizer fertility — symbols emitted per word token when the corpus
    * is segmented with [[bpeMerges]]' learned merges: per document,
    * n_tokens (word count), n_symbols (total BPE symbols across those
    * words) and fertility_permille = n_symbols·1000 div n_tokens. THE
    * tokenizer-evaluation metric (a fertility near 1000 means words
    * collapse to single symbols; high fertility flags a vocabulary that
    * fragments the corpus and inflates sequence lengths).
    *
    * Scale: per-word symbol counts come from the vocabulary-scale merged
    * dictionary; the corpus-scale work is one (doc, word) explode joined
    * to that dictionary (broadcast-sized next to a crawl) and one (id)
    * aggregation. Every doc is audited — tokenless docs report zeros.
    * Returns (id, n_tokens, n_symbols, fertility_permille). */
  def bpeFertility(docs: DataFrame, idCol: String, textCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val seg = dictAfterMerges(docs, textCol, iters)
      .select(col("word"),
        size(filter(split(col("syms"), "_"), x => x =!= "")).cast("long").as("nsym"))
    val per = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("word"))
      .join(broadcast(seg), "word")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("nsym").as("n_symbols"))
    docs.select(col(idCol).as("id"))
      .join(per, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_symbols"), lit(0L)).as("n_symbols"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          expr("(n_symbols * 1000) div n_tokens")).otherwise(lit(0L))
          .as("fertility_permille"))
  }

  /** Cross-split leakage audit — the VALIDATION step behind the
    * leakage-safe split (q104): find document pairs in DIFFERENT splits
    * sharing ≥ `minShared` distinct n-gram shingles. Run on a naive
    * per-document split this surfaces every near-dup twin straddling
    * train/eval (the contamination that inflates eval scores); run on the
    * cluster-canonical split it must return zero rows — the auditable
    * proof of the q104 invariant.
    *
    * Shingle ids are the 48-bit md5 prefix ([[Dedup.incrementalDedup]]'s
    * convention — engine-portable, dictionary-free). Candidates come from
    * the inverted gram index restricted to CROSS-split hits (equi-join on
    * the gram id, never all-pairs). `maxGramDocFreq` (LOSSY) drops grams
    * with document frequency above the cap from the audit universe —
    * boilerplate grams shared by hundreds of documents are excluded from
    * the leakage definition rather than fanning out d² candidate rows;
    * n_shared then counts capped-universe grams (the conservative audit).
    *
    * Input: `docs` must carry `idCol`, `textCol`, and `splitCol`. Output:
    * (split_a, split_b, id_a, id_b, n_shared) with id_a < id_b. */
  def splitLeakageAudit(docs: DataFrame, idCol: String, textCol: String,
      splitCol: String, n: Int, minShared: Long,
      maxGramDocFreq: Option[Int] = None): DataFrame = {
    val ids = Dedup.shingleIndex(docs, idCol, textCol, n)
      .select(col("id"),
        conv(substring(md5(col("s").cast("binary")), 1, 12), 16, 10)
          .cast("long").as("g"))
    val capped = maxGramDocFreq match {
      case Some(c) =>
        val dfreq = ids.groupBy("g").agg(count(lit(1)).as("df"))
        ids.join(dfreq.filter(col("df") <= c).select("g"), "g")
      case None => ids
    }
    val sp = docs.select(col(idCol).as("id"), col(splitCol).as("split"))
    val tagged = capped.join(sp, "id")
    tagged.as("a").join(tagged.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          col("a.split") =!= col("b.split"))
      .groupBy(col("a.id").as("id_a"), col("a.split").as("split_a"),
        col("b.id").as("id_b"), col("b.split").as("split_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select("split_a", "split_b", "id_a", "id_b", "n_shared")
  }
}
