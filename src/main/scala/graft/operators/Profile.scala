package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pass a pipeline runs before
  * training ingest: per-column null counts, distinct cardinality, and
  * quantized min/max/sum, emitted as one tall (col_name, …) frame.
  *
  * Scale design: ONE scan of the input computes every per-column
  * aggregate; the multi-`count_distinct` plan uses Spark's Expand (one
  * duplicated stream per distinct column), which is the documented
  * single-pass tradeoff — for k profiled columns the scan fans out k+1
  * ways BEFORE the shuffle, but each fan-out carries only its one column,
  * and the alternative (k separate jobs) re-reads the table k times. At
  * petabyte inputs swap `count_distinct` for `approx_count_distinct` and
  * keep everything else identical (the declared oracle query uses the
  * exact form).
  *
  * Values quantize to cents (×100 as BIGINT after a DECIMAL(18,2) cast)
  * so min/max/sum are integer aggregates — engine-exact, no float
  * addition order. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    def q(c: String) = expr(s"CAST(CAST($c AS DECIMAL(18,2)) * 100 AS BIGINT)")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null$i"),
        count_distinct(q(c)).as(s"__nd$i"),
        min(q(c)).as(s"__min$i"),
        max(q(c)).as(s"__max$i"),
        sum(q(c)).as(s"__sum$i"))
    } :+ count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) => s"'$c', __null$i, __nd$i, __min$i, __max$i, __sum$i" }
      .mkString(s"stack(${cols.size}, ", ", ", ")")
    one.select(col("n_rows"),
        expr(stackArgs).as(Seq("col_name", "n_null", "n_distinct", "min_q", "max_q", "sum_q")))
      .select("col_name", "n_rows", "n_null", "n_distinct", "min_q", "max_q", "sum_q")
  }
}
