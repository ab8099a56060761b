package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pass a pipeline runs before
  * training ingest: per-column null counts, distinct cardinality, and
  * quantized min/max/sum, emitted as one tall (col_name, …) frame.
  *
  * Scale design: ONE scan explodes each row into (col_idx, value) pairs,
  * then a two-level aggregation — (col_idx, value) partial counts, then
  * per-column rollup — computes nulls/distincts/min/max/sum together.
  * This deliberately AVOIDS the multi-`count_distinct` plan (Catalyst's
  * Expand: one duplicated stream per distinct column, k full-width
  * aggregation buffers): the first-level groupBy is map-side combined, so
  * the shuffle carries at most (distinct values × partitions) rows per
  * column — cardinality-bounded, not row-bounded — and the second level
  * sees only distinct (col, value) pairs. At petabyte inputs with
  * near-unique columns swap level 1 for `approx_count_distinct` and keep
  * everything else identical (the declared oracle query uses the exact
  * form).
  *
  * Values quantize to cents (×100 as BIGINT after a DECIMAL(18,2) cast)
  * so min/max/sum are integer aggregates — engine-exact, no float
  * addition order. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    def q(c: String) = expr(s"CAST(CAST($c AS DECIMAL(18,2)) * 100 AS BIGINT)")
    val tall = df.select(posexplode(array(cols.map(q): _*)).as(Seq("idx", "v")))
    val names = array(cols.map(lit): _*)
    tall.groupBy("idx", "v").agg(count(lit(1)).as("cnt"))
      .groupBy("idx").agg(
        sum("cnt").as("n_rows"),
        sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        min("v").as("min_q"),
        max("v").as("max_q"),
        sum(col("v") * col("cnt")).as("sum_q"))
      .select(element_at(names, col("idx") + 1).as("col_name"),
        col("n_rows"), col("n_null"), col("n_distinct"),
        col("min_q"), col("max_q"), col("sum_q"))
  }

  /** Exact grouped quantiles (linear interpolation at position (n−1)·p —
    * the formula both Spark's `percentile` and DuckDB's `quantile_cont`
    * implement, so the oracle replicates it). Values quantize to integer
    * cents BEFORE the aggregate (the same DECIMAL route as [[profile]]:
    * a raw double→bigint cast truncates on Spark and rounds on DuckDB),
    * and interpolated outputs round to 6 dp to absorb last-ulp division
    * differences.
    *
    * Scale: Spark's exact `percentile` buffers each group's value
    * multiset — correct for BOUNDED group cardinality over categorical
    * keys (event types, domains, shards: the profiling use), where each
    * buffer is one group's values, spread across the aggregation's
    * partitions. For unbounded keys or unbounded per-group counts swap
    * in `approx_percentile` (t-digest-style sketch, same call shape) —
    * the declared oracle query keeps the exact form. Returns
    * (key, n, p<100·p₁>, …). */
  def quantiles(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val cents = expr(s"CAST(CAST($valCol AS DECIMAL(18,2)) * 100 AS BIGINT)")
    val agg = df.select(col(keyCol).as("key"), cents.as("v"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"),
        expr(s"percentile(v, array(${ps.mkString(", ")}))").as("qs"))
    agg.select(col("key") +: col("n") +:
      ps.zipWithIndex.map { case (p, i) =>
        round(element_at(col("qs"), i + 1), 6).as(s"p${math.round(p * 100)}")
      }: _*)
  }

  /** Declarative data-quality expectations (the Deequ/Great-Expectations
    * shape): each rule is a name + a row-level predicate Column; the report
    * is one row per rule with its violation count and pass flag (pass =
    * zero violations). ONE scan evaluates every rule — k conditional-sum
    * aggregates plus the row count in the same aggregation, no joins, no
    * second pass, no driver-side count — so the quality gate costs a single
    * read at any scale. A null predicate result counts as a violation (a
    * rule that cannot evaluate did not pass). Returns
    * (rule, n_violations, n_rows, pass) ordered by rule name. */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one expectation")
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v$i")
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val names = array(rules.map(r => lit(r._1)): _*)
    val viols = array(rules.indices.map(i => col(s"__v$i")): _*)
    one.select(posexplode(viols).as(Seq("idx", "n_violations")), col("__n").as("n_rows"))
      .select(element_at(names, col("idx") + 1).as("rule"),
        col("n_violations"), col("n_rows"),
        (col("n_violations") === 0L).as("pass"))
      .orderBy("rule")
  }
}
