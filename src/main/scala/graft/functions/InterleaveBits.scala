package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) bit interleave of two 16-bit keys — a native Catalyst
  * expression with whole-stage codegen. `zorder2(x, y)` maps
  * (x, y) ∈ [0, 2¹⁶)² to a 32-bit Morton code: bit i of x lands at output
  * bit 2i, bit i of y at 2i+1, so lexicographic order on the code is a
  * space-filling curve over the (x, y) grid.
  *
  * Why it matters at 100 TB: sorting/range-partitioning a table by the
  * Morton code clusters BOTH keys at once, so min/max zone maps (parquet
  * row-group stats, Delta/Iceberg file stats) prune scans for predicates on
  * EITHER column — the standard multi-dimensional clustering trick
  * (Z-ORDER in Delta/Iceberg). The expression is pure bit arithmetic:
  * codegen emits the classic shift-mask spread (5 ops per operand), no
  * loop, no UDF, fully inside whole-stage codegen.
  *
  * Inputs are LONG (callers mask to 16 bits, `pmod(k, 65536)`); out-of-range
  * inputs raise rather than silently aliasing distinct keys to one cell.
  */
case class InterleaveBits(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder2 requires two BIGINT arguments, got $l and $r")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    if (x < 0 || x > 0xFFFFL || y < 0 || y > 0xFFFFL)
      throw new IllegalArgumentException(
        s"zorder2: inputs must be in [0, 65536), got ($x, $y)")
    InterleaveBits.spread(x) | (InterleaveBits.spread(y) << 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      // the shift-mask spread inlined for both operands; identical constants
      // to the interpreted path
      def spread(in: String, out: String): String =
        s"""long $out = $in;
           |$out = ($out | ($out << 8)) & 0x00FF00FFL;
           |$out = ($out | ($out << 4)) & 0x0F0F0F0FL;
           |$out = ($out | ($out << 2)) & 0x33333333L;
           |$out = ($out | ($out << 1)) & 0x55555555L;""".stripMargin
      s"""
         |if ($a < 0L || $a > 65535L || $b < 0L || $b > 65535L)
         |  throw new IllegalArgumentException("zorder2: inputs must be in [0, 65536), got ("
         |    + $a + ", " + $b + ")");
         |${spread(a, sx)}
         |${spread(b, sy)}
         |${ev.value} = $sx | ($sy << 1);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spread the low 16 bits of `v` to even bit positions (Morton spread). */
  def spread(v: Long): Long = {
    var x = v
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
}
