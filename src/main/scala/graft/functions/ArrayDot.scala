package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused dot product over two `ARRAY<FLOAT>` columns — a native Catalyst
  * expression with whole-stage codegen (`doGenCode` emits a tight scalar
  * loop), so similarity joins score each candidate pair in one pass with no
  * 64× explode + hash-aggregation detour and no UDF serialization.
  *
  * `scale == 0`: plain double accumulation (fast production mode).
  * `scale > 0`: each element quantizes to `sign·floor(|x|·scale + 0.5)` and
  * the products accumulate in exact 64-bit integers — order-independent and
  * engine-portable, the same formula the DuckDB oracle runs (see
  * graft.llmops.Similarity).
  *
  * (Lives under `org.apache.spark.sql` to reach the `private[sql]`
  * expression-to-Column bridge; the public surface is
  * `graft.functions.GraftFunctions` / `graft.functions.GraftExtensions`.)
  */
case class ArrayDot(left: Expression, right: Expression, scale: Long)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot requires two ARRAY<FLOAT> arguments, got $l and $r")
    }

  override def dataType: DataType = if (scale > 0) LongType else DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // a dimension mismatch is a data bug — a silent min-length truncation
    // would skew similarity rankings plausibly-but-wrongly, so raise
    // (checked identically in codegen)
    if (x.numElements() != y.numElements()) throw new IllegalArgumentException(
      s"array_dot: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    // null elements contribute 0 — checked identically here and in codegen
    // (unguarded codegen would silently read 0.0 from unsafe rows while the
    // interpreted path NPEs; the explicit guard makes both paths agree)
    if (scale > 0) {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i))
          acc += quant(x.getFloat(i)) * quant(y.getFloat(i))
        i += 1
      }
      acc
    } else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i))
          acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  private def quant(f: Float): Long = {
    val xd = f.toDouble
    (math.signum(xd) * math.floor(math.abs(xd) * scale + 0.5)).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xd = ctx.freshName("xd")
      val yd = ctx.freshName("yd")
      if (scale > 0)
        s"""
           |if ($a.numElements() != $b.numElements())
           |  throw new IllegalArgumentException("array_dot: dimension mismatch ("
           |    + $a.numElements() + " vs " + $b.numElements() + ")");
           |int $n = $a.numElements();
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) continue;
           |  double $xd = (double) $a.getFloat($i);
           |  double $yd = (double) $b.getFloat($i);
           |  $acc += (long) (Math.signum($xd) * Math.floor(Math.abs($xd) * ${scale}D + 0.5D))
           |        * (long) (Math.signum($yd) * Math.floor(Math.abs($yd) * ${scale}D + 0.5D));
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      else
        s"""
           |if ($a.numElements() != $b.numElements())
           |  throw new IllegalArgumentException("array_dot: dimension mismatch ("
           |    + $a.numElements() + " vs " + $b.numElements() + ")");
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) continue;
           |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
           |}
           |${ev.value} = $acc;
           |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Expression↔Column bridge re-exported for the graft.functions facade. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Arity-checked expression builder shared by every SQL registration path. */
  def build(name: String, scale: Long)(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"$name requires exactly 2 arguments, got ${children.length}")
    ArrayDot(children(0), children(1), scale)
  }

  /** Arity-checked builder for the zorder2 Morton-interleave expression. */
  def buildZorder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"zorder2 requires exactly 2 arguments, got ${children.length}")
    InterleaveBits(children(0), children(1))
  }

  /** Register the graft SQL functions on an ALREADY-RUNNING session (the
    * extensions path only applies at session build time). */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      build("array_dot", 0L) _)
    reg.registerFunction(new FunctionIdentifier("array_dot_scaled"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot_scaled"),
      build("array_dot_scaled", 100000000L) _)
    reg.registerFunction(new FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "zorder2"),
      buildZorder _)
  }
}
