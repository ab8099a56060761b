package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared tokenization/hashing primitives for the LLM-data-pipeline operators.
  *
  * Everything here is a pure `Column` expression (whole-stage codegen, no
  * UDFs) and is deliberately expressible in ANSI SQL so the DuckDB oracle can
  * replicate results bit-for-bit (SURVEY.md §2.3).
  */
object TextOps {
  /** 2^31 − 1 (Mersenne prime) — modulus for all integer hashing. */
  val P: Long = 2147483647L

  /** Lowercase alphanumeric word tokens. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Normalize any integer token id into [0, P). */
  def norm(tid: Column): Column = pmod(tid.cast("long"), lit(P))

  /** The i-th universal-hash family member over a normalized token id:
    * `h_i(t) = ((2i+1)·t + 7919·(i+1)) mod P`. Odd multipliers, fixed offsets
    * — deterministic and overflow-safe in 64-bit. */
  def hashI(i: Column, tid: Column): Column =
    pmod((lit(2L) * i + 1L) * norm(tid) + lit(7919L) * (i + lit(1L)), lit(P))

  /** Scale-path token id: 64-bit xxhash folded into [0, P). No dictionary,
    * no extra shuffle — the id is computed streaming in the scan stage. */
  def hashTokenId(tok: Column): Column = norm(xxhash64(tok))
}
