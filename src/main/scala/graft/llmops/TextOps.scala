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

  /** Canonical URL for crawl-style dedup (the key CCNet/RefinedWeb-class
    * pipelines group on BEFORE any content hashing): lowercased scheme and
    * host, leading `www.` stripped, default port dropped (`:80` for http,
    * `:443` for https — non-default ports kept), fragment dropped,
    * trailing path slashes trimmed, query params with tracking prefixes
    * (`utm_*`, `fbclid=`, `gclid=`, `ref=`) removed and the survivors
    * sorted bytewise. Path case is PRESERVED (paths are case-sensitive;
    * hosts are not).
    *
    * Pure `Column` composition — regexp extracts + one array
    * filter/sort/join, all whole-stage codegen in the scan, no shuffle;
    * every step has a same-named DuckDB twin (`regexp_extract` /
    * `list_filter` / `list_sort` / `array_to_string`), so the canonical
    * string replicates byte-for-byte in the oracle. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val host = regexp_replace(
      regexp_extract(hostport, "^([^:]*)", 1), "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val pathq = regexp_extract(rest, "^[^/?#]*([^#]*)", 1)
    val path = regexp_replace(
      regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" &&
        substring(p, 1, 4) =!= "utm_" &&
        substring(p, 1, 7) =!= "fbclid=" &&
        substring(p, 1, 6) =!= "gclid=" &&
        substring(p, 1, 4) =!= "ref=")
    val canonQ = array_join(sort_array(params), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(canonQ =!= "", concat(lit("?"), canonQ)).otherwise(lit("")))
  }
}
