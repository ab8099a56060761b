package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analytics => Ops}
import graft.sources.Tables

/** Round-8 continuation: corpus-selection and profiling operators whose
  * value is the SHAPE they impose at 100 TB — Pareto-skyline selection
  * (q153: which documents are undominated on content-vs-noise), one-pass
  * mergeable histogram quantiles (q154: the sketch answer to q80's exact
  * sort), and a one-pass correlation-piece profile (q155: every pairwise
  * Pearson numerator from a single aggregate). Same determinism rules as
  * the rest of the declared surface: every gated column is an integer.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  // ------------------------------------------------- q153 pareto skyline

  /** North star/curation — Pareto-skyline document selection
    * ([[graft.operators.Analytics.skyline2D]]): the undominated frontier
    * on (content ↑, noise ↓), where content = alphanumeric char count and
    * noise = non-alphanumeric char count. Multi-criteria "which documents
    * are strictly worth keeping" — the frontier no weighted quality score
    * (q56/q143) can express, because it presumes no weighting. One
    * groupBy shuffle + a metadata-scale triangular staircase + one
    * broadcast join back; never n². */
  def q153Skyline(s: SparkSession, dir: String): DataFrame = {
    val alnum = expr(
      "CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '')) AS BIGINT)")
    val m = docs(s, dir).select(
      col("doc_id"),
      alnum.as("m_up"),
      (length(col("text")).cast("long") - alnum).as("m_down"))
    Ops.skyline2D(m, "doc_id", "m_up", "m_down").orderBy("doc_id")
  }

  val q153Sql: String =
    """WITH m AS (SELECT doc_id,
      |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS m_up,
      |    CAST(length(text) - length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS m_down
      |  FROM documents),
      |g AS (SELECT m_up, min(m_down) AS g_min FROM m GROUP BY 1),
      |s AS (SELECT a.m_up, a.g_min, min(b.g_min) AS strict_min
      |      FROM g a LEFT JOIN g b ON b.m_up > a.m_up GROUP BY 1, 2)
      |SELECT m.doc_id, m.m_up, m.m_down
      |FROM m JOIN s USING (m_up)
      |WHERE m.m_down = s.g_min AND (s.strict_min IS NULL OR m.m_down < s.strict_min)
      |ORDER BY m.doc_id""".stripMargin

  // --------------------------------------- q154 histogram quantiles

  /** S8/Ranks counterpart — one-pass mergeable histogram quantiles
    * ([[graft.operators.Analytics.histogramQuantiles]]): P50/P95/P99 of
    * l_extendedprice (integer cents) per return flag from equi-width
    * $1000 bins. Where q80 pays a full per-group sort (exact), this pays
    * one partial-aggregating shuffle of ≤ |groups|·|bins| rows — the
    * shape that still works when a group holds 10¹¹ rows — and the
    * estimate (bin edge + exact-integer linear interpolation at rank
    * ceil(n·pct/100)) is itself hash-gated, not just "close". */
  def q154HistQuantiles(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "lineitem").select(
      col("l_returnflag").as("g"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
    Ops.histogramQuantiles(v, "g", "v", binWidth = 100000L,
      targetsPct = Seq(50, 95, 99)).orderBy("g", "pct")
  }

  val q154Sql: String =
    """WITH v AS (SELECT l_returnflag AS g,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM lineitem),
      |b AS (SELECT g, v // 100000 AS bin, CAST(count(*) AS BIGINT) AS c
      |      FROM v GROUP BY 1, 2),
      |c AS (SELECT g, bin, c,
      |        CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY bin
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb,
      |        CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
      |      FROM b),
      |tr AS (SELECT c.*, CAST(pct AS BIGINT) AS pct,
      |         (n * pct + 99) // 100 AS r
      |       FROM c CROSS JOIN (SELECT unnest([50, 95, 99]) AS pct) p)
      |SELECT g, pct, n, r, bin,
      |  bin * 100000 + ((r - cumb) * 100000) // c AS est_q
      |FROM tr WHERE cumb < r AND r <= cumb + c
      |ORDER BY g, pct""".stripMargin

  // --------------------------------------- q155 correlation pieces

  /** Profiling (q64's bivariate extension) — every pairwise Pearson
    * correlation numerator over lineitem's four measures from ONE
    * aggregate pass: n, Σx, Σy, Σx², Σxy, Σy² per pair, all exact
    * integers (quantity in units, price in whole dollars, discount/tax in
    * basis points — chosen so Σx² stays in BIGINT through sf≈100; beyond
    * that the same plan swaps DECIMAL(38,0) sums in). The corpus is
    * touched once; the 6-pair reshape is a stack over the single
    * aggregate row. r² = (nΣxy−ΣxΣy)² / ((nΣx²−Σx²)(nΣy²−Σy²)) assembles
    * downstream from these gated pieces without re-reading data. */
  def q155CorrPieces(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "lineitem").select(
      expr("CAST(CAST(l_quantity AS DECIMAL(18,0)) AS BIGINT)").as("q"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,0)) AS BIGINT)").as("p"),
      expr("CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)").as("d"),
      expr("CAST(CAST(l_tax AS DECIMAL(18,4)) * 10000 AS BIGINT)").as("tx"))
    val a = v.agg(
      count(lit(1)).as("n"),
      sum("q").as("s_q"), sum("p").as("s_p"),
      sum("d").as("s_d"), sum("tx").as("s_t"),
      sum(col("q") * col("q")).as("s_qq"), sum(col("p") * col("p")).as("s_pp"),
      sum(col("d") * col("d")).as("s_dd"), sum(col("tx") * col("tx")).as("s_tt"),
      sum(col("q") * col("p")).as("s_qp"), sum(col("q") * col("d")).as("s_qd"),
      sum(col("q") * col("tx")).as("s_qt"), sum(col("p") * col("d")).as("s_pd"),
      sum(col("p") * col("tx")).as("s_pt"), sum(col("d") * col("tx")).as("s_dt"))
    a.select(expr(
      """stack(6,
        |  'disc_tax',  n, s_d, s_t, s_dd, s_dt, s_tt,
        |  'price_disc', n, s_p, s_d, s_pp, s_pd, s_dd,
        |  'price_tax', n, s_p, s_t, s_pp, s_pt, s_tt,
        |  'qty_disc',  n, s_q, s_d, s_qq, s_qd, s_dd,
        |  'qty_price', n, s_q, s_p, s_qq, s_qp, s_pp,
        |  'qty_tax',   n, s_q, s_t, s_qq, s_qt, s_tt
        |) AS (pair, n, s_x, s_y, s_xx, s_xy, s_yy)""".stripMargin))
      .orderBy("pair")
  }

  val q155Sql: String =
    """WITH v AS (SELECT
      |    CAST(CAST(l_quantity AS DECIMAL(18,0)) AS BIGINT) AS q,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,0)) AS BIGINT) AS p,
      |    CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT) AS d,
      |    CAST(CAST(l_tax AS DECIMAL(18,4)) * 10000 AS BIGINT) AS tx
      |  FROM lineitem),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(q) AS BIGINT) AS s_q, CAST(sum(p) AS BIGINT) AS s_p,
      |    CAST(sum(d) AS BIGINT) AS s_d, CAST(sum(tx) AS BIGINT) AS s_t,
      |    CAST(sum(q * q) AS BIGINT) AS s_qq, CAST(sum(p * p) AS BIGINT) AS s_pp,
      |    CAST(sum(d * d) AS BIGINT) AS s_dd, CAST(sum(tx * tx) AS BIGINT) AS s_tt,
      |    CAST(sum(q * p) AS BIGINT) AS s_qp, CAST(sum(q * d) AS BIGINT) AS s_qd,
      |    CAST(sum(q * tx) AS BIGINT) AS s_qt, CAST(sum(p * d) AS BIGINT) AS s_pd,
      |    CAST(sum(p * tx) AS BIGINT) AS s_pt, CAST(sum(d * tx) AS BIGINT) AS s_dt
      |  FROM v)
      |SELECT 'disc_tax' AS pair, n, s_d AS s_x, s_t AS s_y, s_dd AS s_xx, s_dt AS s_xy, s_tt AS s_yy FROM a
      |UNION ALL SELECT 'price_disc', n, s_p, s_d, s_pp, s_pd, s_dd FROM a
      |UNION ALL SELECT 'price_tax', n, s_p, s_t, s_pp, s_pt, s_tt FROM a
      |UNION ALL SELECT 'qty_disc', n, s_q, s_d, s_qq, s_qd, s_dd FROM a
      |UNION ALL SELECT 'qty_price', n, s_q, s_p, s_qq, s_qp, s_pp FROM a
      |UNION ALL SELECT 'qty_tax', n, s_q, s_t, s_qq, s_qt, s_tt FROM a
      |ORDER BY pair""".stripMargin

  // ------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_skyline" -> (q153Skyline _),
    "q154_hist_quantiles" -> (q154HistQuantiles _),
    "q155_corr_pieces" -> (q155CorrPieces _))

  val oracleSql: Map[String, String] = Map(
    "q153_skyline" -> q153Sql,
    "q154_hist_quantiles" -> q154Sql,
    "q155_corr_pieces" -> q155Sql)
}
