package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming incremental substring-dup admission (S26 depth) — the
  * ingest-time form of the batch ExactSubstr operator
  * (graft.llmops.Dedup.substringDedup): each arriving document is scored
  * against the STATIC reference corpus' duplicated-gram index and admitted
  * or rejected before it ever lands in the corpus — the "don't let
  * boilerplate in" gate, where q204 is the "clean what's already in"
  * batch pass.
  *
  * Per micro-batch: the arriving doc's L-gram digests probe the
  * (persisted) static gram index with a LEFT join, and the
  * covered-character total is folded per document. Streaming plans cannot
  * use ordinary window functions, so the q204 island merge is re-expressed
  * as a higher-order `aggregate` over the doc's sorted hit positions — a
  * per-document array bounded by document length. The only stateful
  * operator is the per-doc rollup (state = one verdict row per arriving
  * document — position rows never enter the state store; a production
  * deployment appends with a watermark to expire emitted docs).
  *
  * Scale: the static index shuffles fixed-width digests (built once and
  * persisted — the stream re-evaluates static frames per batch otherwise);
  * per-batch cost ∝ batch character count. The admission rule is an exact
  * integer cross-multiply (dup_chars·1000 < doc_len·permilleMax), so the
  * verdict hash-gates.
  */
object StreamSubstr {

  /** Distinct SHA-256 digests of every `L`-gram of `textCol` in `docs` —
    * the static reference index an arriving document probes. */
  def gramIndex(docs: DataFrame, textCol: String, L: Int): DataFrame =
    docs.filter(length(col(textCol)) >= L)
      .select(explode(expr(
        s"transform(sequence(0, length($textCol) - $L), " +
          s"p -> sha2(cast(substring($textCol, p + 1, $L) as binary), 256))"))
        .as("h"))
      .distinct()

  /** Admission verdicts for a stream of (id, text) documents against a
    * static gram index ([[gramIndex]] output, persisted by the caller):
    * one row per arriving doc of length ≥ L — (id, doc_len, n_dup_spans,
    * dup_chars, admitted), admitted iff dup_chars·1000 < doc_len·
    * `permilleMax`. */
  def admission(stream: DataFrame, staticGrams: DataFrame, L: Int,
      permilleMax: Long): DataFrame = {
    val probes = stream
      .filter(length(col("text")) >= L)
      .select(col("id"), length(col("text")).cast("long").as("doc_len"),
        explode(expr(s"sequence(0, length(text) - $L)")).as("pos"),
        col("text"))
      .withColumn("h",
        sha2(expr(s"substring(text, pos + 1, $L)").cast("binary"), 256))
      .drop("text")
      .join(staticGrams.withColumn("hit", lit(true)), Seq("h"), "left")
    // q204's gaps-and-islands, windowless: fold the sorted hit positions —
    // cov += (p+L) − max(lst, p) when positive; span count ticks on gaps
    val fold = expr(
      s"""aggregate(
         |  array_sort(hits),
         |  named_struct('cov', CAST(0 AS BIGINT), 'sp', CAST(0 AS BIGINT),
         |               'lst', CAST(-1 AS BIGINT)),
         |  (acc, p) -> named_struct(
         |    'cov', acc.cov + greatest(CAST(0 AS BIGINT),
         |             p + $L - greatest(acc.lst, p)),
         |    'sp', acc.sp + CASE WHEN p > acc.lst THEN 1 ELSE 0 END,
         |    'lst', greatest(acc.lst, p + $L)),
         |  acc -> named_struct('cov', acc.cov, 'sp', acc.sp))""".stripMargin)
    probes
      .groupBy("id", "doc_len")
      .agg(collect_list(when(col("hit"), col("pos").cast("long"))).as("hits"))
      .withColumn("f", fold)
      .select(col("id"), col("doc_len"),
        col("f.sp").as("n_dup_spans"), col("f.cov").as("dup_chars"))
      .withColumn("admitted",
        col("dup_chars") * 1000L < col("doc_len") * permilleMax)
  }
}
