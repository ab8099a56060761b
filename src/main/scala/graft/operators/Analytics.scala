package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-shaped analytics operators: Pareto-skyline selection, mergeable
  * one-pass histogram quantiles, and a one-pass correlation-piece profile.
  *
  * All three are "decide what data to keep / how it is shaped" primitives a
  * curation pipeline runs over the full corpus, so each is built around one
  * partial-aggregating shuffle and metadata-scale post-processing — never a
  * global sort or an n² pairing. Determinism rules match the rest of the
  * declared surface: every gated column is an integer (or a DECIMAL(38,0)
  * exact integer for overflow-proof sums).
  */
object Analytics {

  /** 2-D Pareto skyline: rows not strictly dominated by any other row,
    * where a dominates b iff a.up >= b.up AND a.down <= b.down with at
    * least one strict (maximize `upCol`, minimize `downCol`).
    *
    * Shape: one groupBy(up) shuffle collapses the corpus to ≤ |distinct up|
    * group rows (bounded by the metric's VALUE RANGE, not the corpus — for
    * char-count metrics that is ≤ max document length, metadata-scale).
    * The dominance staircase (min down over strictly-greater up) is a
    * triangular join over those group rows only — the same
    * metadata-triangular construct [[Ranks.globalRank]] uses for partition
    * offsets — then survivors are recovered with one broadcast equi-join
    * back to the corpus. No unpartitioned window, no n² pairing.
    */
  def skyline2D(df: DataFrame, idCol: String, upCol: String, downCol: String): DataFrame = {
    val g = df.groupBy(col(upCol)).agg(min(col(downCol)).as("g_min"))
    // up is unique per group row, so the strict-dominance prefix min is a
    // triangular join over the metadata-scale group frame
    val stair = g.as("a")
      .join(g.as("b"), col(s"b.$upCol") > col(s"a.$upCol"), "left")
      .groupBy(col(s"a.$upCol").as(upCol), col("a.g_min").as("g_min"))
      .agg(min(col("b.g_min")).as("strict_min"))
    // survivor: best down within its up group, and strictly below every
    // group with larger up (strict_min <= down means a dominator exists)
    df.join(broadcast(stair), Seq(upCol))
      .where(col(downCol) === col("g_min") &&
        (col("strict_min").isNull || col(downCol) < col("strict_min")))
      .select(col(idCol), col(upCol), col(downCol))
  }

  /** One-pass mergeable equi-width-histogram quantile estimation, the
    * 100 TB alternative to exact sort-based quantiles (q80): bin counts
    * are a partial-aggregating groupBy (each executor emits ≤ |bins| rows
    * per group), the cumulative walk and the in-bin linear interpolation
    * run over the tiny (group × bin) frame. Estimates are exact-integer:
    * rank r = ceil(n·pct/100), est = bin_lo + floor((r - cum_before)·W / c).
    * Requires non-negative integer `valueCol` (quantize first).
    *
    * Output: (group, pct, n, r, bin, est_q) — one row per requested
    * percentile per group.
    */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      binWidth: Long, targetsPct: Seq[Int]): DataFrame = {
    val bc = df
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
      .withColumn("bin", expr(s"v div ${binWidth}L"))
      .groupBy("g", "bin").agg(count(lit(1)).as("c"))
    histogramQuantilesFromBins(bc, binWidth, targetsPct)
  }

  /** The quantile-extraction half of [[histogramQuantiles]], starting from
    * an already-materialized (g, bin, c) count frame — the entry point for
    * MERGEABLE histogram state (e.g. a streaming aggregation whose state
    * is the bins): the walk costs one per-group window over |bins| rows,
    * never touching raw values. */
  def histogramQuantilesFromBins(bc: DataFrame, binWidth: Long,
      targetsPct: Seq[Int]): DataFrame = {
    val wcum = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wall = Window.partitionBy("g")
    bc.withColumn("cumb", coalesce(sum("c").over(wcum), lit(0L)))
      .withColumn("n", sum("c").over(wall))
      .withColumn("pct", explode(array(targetsPct.map(p => lit(p)): _*)))
      .withColumn("r", expr("(n * pct + 99) div 100"))
      .where(col("cumb") < col("r") && col("r") <= col("cumb") + col("c"))
      .select(col("g"), col("pct").cast("long").as("pct"), col("n"),
        col("r"),
        col("bin"),
        expr(s"bin * ${binWidth}L + ((r - cumb) * ${binWidth}L) div c").as("est_q"))
  }

  /** Leave-one-out target encoding of a categorical column: each row's
    * encoding is the mean target of its category EXCLUDING the row itself —
    * ⌊1e6·(Σ_g y − y_i) / (n_g − 1)⌋ — the standard high-cardinality
    * categorical feature that, computed naively (full-group mean), leaks
    * each row's own label into its feature. Exact integers throughout
    * (binary target); singleton categories encode as −1 (no peers — the
    * caller decides a prior). One groupBy shuffle + one equi-join back;
    * the category stats frame is |categories| rows. */
  def looTargetEncode(df: DataFrame, catCol: String, idCol: String,
      targetCol: String): DataFrame = {
    val g = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("n_cat"), sum(col(targetCol)).as("sum_y"))
    df.select(col(idCol), col(catCol), col(targetCol).as("y"))
      .join(g, catCol)
      .withColumn("loo_ppm", expr(
        "CASE WHEN n_cat = 1 THEN -1L ELSE ((sum_y - y) * 1000000) div (n_cat - 1) END"))
      .select(col(idCol), col(catCol), col("y"), col("n_cat"), col("loo_ppm"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic per group, in crossed
    * integer arithmetic: D = max_v |F_a(v) − F_b(v)| is reported as
    * d_num = max_v |cumA(v)·n_b − cumB(v)·n_a| (so D = d_num/(n_a·n_b) —
    * no floats anywhere) plus the floored d_ppm. The distribution-drift
    * test q162's fixed bins approximate, made exact: evaluated at every
    * DISTINCT value, ties handled by grouping before the cumulative walk.
    *
    * Shape: one groupBy to (group, value) rows, two group-partitioned
    * cumulative windows, one max aggregate — never a global sort. `flagCol`
    * (boolean) marks the A sample. */
  def ksStat(df: DataFrame, keyCol: String, valueCol: String,
      flagCol: String): DataFrame = {
    val c = df.select(col(keyCol).as("g"), col(valueCol).as("v"),
        col(flagCol).as("a"))
      .groupBy("g", "v")
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("c_b"))
    val wcum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy("g")
    c.withColumn("cum_a", sum("c_a").over(wcum))
      .withColumn("cum_b", sum("c_b").over(wcum))
      .withColumn("n_a", sum("c_a").over(wall))
      .withColumn("n_b", sum("c_b").over(wall))
      .groupBy(col("g").as("key"))
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
          .as("d_num"))
      .withColumn("d_ppm", expr(
        "CASE WHEN n_a = 0 OR n_b = 0 THEN -1L ELSE (d_num * 1000000) div (n_a * n_b) END"))
  }

  /** Floored scaled division ⌊num·scale / den⌋ as a SQL expression string
    * over integral column/sub-expressions, negative-safe: Spark's `div`
    * and DuckDB's `//` both truncate toward zero, so the floor for
    * possibly-negative numerators needs the floor-mod identity
    * (num·s − ((num·s mod d) + d) mod d) div d — spelled ONCE here. The
    * DuckDB oracle spells the identical arithmetic with `//` (swap the
    * operator; the mod identity is the same). NULL when `den` is zero
    * (both engines hash NULL = NULL), flagging degenerate groups instead
    * of silently dividing. */
  def floorDivScaledSql(num: String, den: String, scale: Long,
      op: String = "div"): String = {
    // the L suffix is Spark-only; DuckDB (`op = "//"`) takes a bare literal.
    // Operands are parenthesized so compound sub-expressions keep their
    // precedence. The floor-mod identity assumes den > 0 (or 0 -> NULL);
    // a negative denominator would need the sign folded into num first.
    val k = if (op == "div") s"${scale}L" else scale.toString
    s"CASE WHEN ($den) = 0 THEN CAST(NULL AS BIGINT) " +
      s"ELSE (($num) * $k - (((($num) * $k) % ($den)) + ($den)) % ($den)) $op ($den) END"
  }

  /** Robust per-group outlier report by median absolute deviation: median
    * and MAD are the EXACT rank-⌈n/2⌉ order statistics (lower median, id
    * tie-break — no averaging of middles, so every number is an input
    * integer), outliers are rows with |v − med| > k·MAD. The
    * Hampel-filter answer to "which values are anomalous" that, unlike
    * mean/stddev (q64), a few huge outliers cannot drag.
    *
    * Shape: two group-partitioned windows (never global) over the value
    * and deviation orders, a broadcast join of the metadata-scale
    * per-group medians, one final aggregate. Output one row per group:
    * (key, n, med, mad, n_outliers). */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
      idCol: String, k: Long = 3L): DataFrame = {
    val v = df.select(col(keyCol).as("g"), col(valueCol).as("v"),
      col(idCol).as("rid"))
    val wv = Window.partitionBy("g").orderBy("v", "rid")
    val med = v
      .withColumn("rn", row_number().over(wv))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("g"), col("v").as("med"), col("n"))
    val dev = v.join(broadcast(med), "g")
      .withColumn("dev", abs(col("v") - col("med")))
    val wd = Window.partitionBy("g").orderBy("dev", "rid")
    val mad = dev
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("g"), col("dev").as("mad"))
    dev.join(broadcast(mad), "g")
      .groupBy(col("g").as("key"))
      .agg(count(lit(1)).as("n"), max("med").as("med"), max("mad").as("mad"),
        sum(when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Exact tie-corrected ROC-AUC by Mann–Whitney rank-sum, in doubled-rank
    * integer arithmetic: under the (score, id) total order a tie group's
    * ordinal ranks span exactly [lo, hi], so twice a member's AVERAGE rank
    * is lo + hi — no fractional ranks and no prefix-sum pass.
    * u2 = 2U = Σ₊(lo+hi) − n₊(n₊+1) equals 2·#{(p,n): s_p > s_n} +
    * #{(p,n): s_p = s_n}; auc_ppm = ⌊1e6·u2 / (2n₊n₋)⌋.
    *
    * Shape: one distributed rank ([[Ranks.globalRank]] — range partition +
    * offsets, no single-partition window), one groupBy over DISTINCT scores
    * for the tie bounds, one scalar aggregate. `scoreCol` must be integral
    * and `idCol` a unique tie-breaker; `truthCol` boolean. Output is a
    * single row (n_pos, n_neg, u2, auc_ppm); a one-class input (n_pos or
    * n_neg = 0) yields the -1 sentinel, never NULL or a crash.
    */
  def aucRankSum(df: DataFrame, scoreCol: String, idCol: String,
      truthCol: String, cache: Boolean = true): DataFrame = {
    val ranked0 = Ranks.globalRank(
      df.select(col(scoreCol).as("__s"), col(idCol).as("__id"),
        col(truthCol).as("__t")),
      "__rnk", col("__s"), col("__id"))
    // feeds the tie bounds AND the join-back — the rank pass (and
    // everything upstream of it) would otherwise run once per consumer
    // (r13 opt); cache=false keeps the full plan visible for the pins
    val ranked = if (cache) ranked0.localCheckpoint() else ranked0
    val ties = ranked.groupBy("__s")
      .agg(min("__rnk").as("__lo"), max("__rnk").as("__hi"))
    ranked.join(ties, "__s")
      .agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("__t"), col("__lo") + col("__hi")).otherwise(0L)).as("r2_pos"))
      .withColumn("u2", expr("r2_pos - n_pos * (n_pos + 1)"))
      .withColumn("auc_ppm", expr(
        "CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1L " +
          "ELSE (u2 * 1000000) div (2 * n_pos * n_neg) END"))
      .select("n_pos", "n_neg", "u2", "auc_ppm")
  }
}
