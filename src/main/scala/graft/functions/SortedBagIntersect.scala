package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multiset intersection size of two SORTED `ARRAY<STRING>` columns —
  * Σ_t min(count_a(t), count_b(t)) — as one native merge loop per row.
  *
  * The weighted-Jaccard numerator over token bags: with each document
  * carried as its binary-sorted full token array (built in the scan stage
  * by `array_sort(tokens(text))`, zero shuffles), the per-pair rescore is
  * this single codegen-friendly merge instead of the
  * `map_zip_with → map_values → aggregate` chain (three interpreted
  * higher-order expressions with per-pair map materialization). Both
  * inputs MUST be sorted by the same binary UTF8String order — the merge
  * silently undercounts otherwise; `array_sort` provides exactly that
  * order. Null elements (none in tokenizer output) sort LAST per
  * `array_sort` and compare equal to each other here. */
case class SortedBagIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_bag_intersect_size requires two ARRAY<STRING>, got $l, $r")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_bag_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedBagIntersectSize.merge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |${ev.value} = org.apache.spark.sql.graft.SortedBagIntersectSize.merge($a, $b);
       |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedBagIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedBagIntersectSize {
  /** Matched-element count of two sorted UTF8String arrays (shared by the
    * interpreted and generated paths — one static call per row). */
  def merge(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = if (a.isNullAt(i)) null else a.getUTF8String(i)
      val y = if (b.isNullAt(j)) null else b.getUTF8String(j)
      val c =
        if (x == null && y == null) 0
        else if (x == null) 1 // nulls sort last under array_sort
        else if (y == null) -1
        else x.compareTo(y)
      if (c == 0) { n += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }
}
