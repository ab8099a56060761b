package graft.operators

import org.apache.spark.sql.DataFrame
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
}
