package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature of an `ARRAY<FLOAT>` vector as ONE
  * native loop expression: bit i = sign(v · plane_i) for `planes`
  * deterministic ±1 hyperplanes (LCG over i·dim+j, bit 16 — identical to
  * the SQL form the oracles replicate, see graft.llmops.Similarity).
  *
  * Replaces the unrolled planes×dim expression tree: at 16×64 the tree is
  * 1024 terms, which costs seconds of Catalyst analysis/codegen EVERY time
  * a plan containing it is compiled (the q67 lesson — generated code must
  * be constant-size in the operating point, not linear in it). The loop
  * form is ~30 lines of generated code regardless of planes/dim.
  *
  * `scale > 0`: elements quantize to `sign·floor(|x|·scale + 0.5)` 64-bit
  * integers and plane dots accumulate exactly (order-independent,
  * engine-portable — the hash-gate mode). `scale == 0`: plain double
  * accumulation (production mode).
  */
case class HyperplaneSig(child: Expression, planes: Int, dim: Int, scale: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires ARRAY<FLOAT>, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  /** ±1 plane component for (plane i, dim j) — the LCG's bit 16 (the low
    * bit is pure parity; a middle bit is well mixed). */
  private def sgn(i: Int, j: Int): Int =
    if ((((2654435761L * (i.toLong * dim + j) + 40503L) % 4294967296L) >> 16 & 1L) == 0L) -1 else 1

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"hyperplane_sig: vector dim ${v.numElements()} != $dim")
    var sig = 0L
    var i = 0
    while (i < planes) {
      var j = 0
      if (scale > 0) {
        var dot = 0L
        while (j < dim) {
          if (!v.isNullAt(j)) {
            val xd = v.getFloat(j).toDouble
            dot += (math.signum(xd) * math.floor(math.abs(xd) * scale + 0.5)).toLong * sgn(i, j)
          }
          j += 1
        }
        if (dot > 0) sig |= 1L << i
      } else {
        var dot = 0.0
        while (j < dim) {
          if (!v.isNullAt(j)) dot += v.getFloat(j).toDouble * sgn(i, j)
          j += 1
        }
        if (dot > 0) sig |= 1L << i
      }
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val (sig, i, j, dot, xd, s) = (ctx.freshName("sig"), ctx.freshName("i"),
        ctx.freshName("j"), ctx.freshName("dot"), ctx.freshName("xd"), ctx.freshName("s"))
      val accDecl = if (scale > 0) s"long $dot = 0L;" else s"double $dot = 0.0;"
      val accAdd = if (scale > 0)
        s"""double $xd = (double) $v.getFloat($j);
           |      $dot += (long) (Math.signum($xd) * Math.floor(Math.abs($xd) * ${scale}D + 0.5D)) * $s;""".stripMargin
      else s"$dot += ((double) $v.getFloat($j)) * $s;"
      s"""
         |if ($v.numElements() != $dim) throw new IllegalArgumentException(
         |  "hyperplane_sig: vector dim " + $v.numElements() + " != " + $dim);
         |long $sig = 0L;
         |for (int $i = 0; $i < $planes; $i++) {
         |  $accDecl
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($v.isNullAt($j)) continue;
         |    long $s = ((((2654435761L * ((long) $i * $dim + $j) + 40503L) % 4294967296L) >> 16) & 1L) == 0L ? -1L : 1L;
         |    $accAdd
         |  }
         |  if ($dot > 0) $sig |= 1L << $i;
         |}
         |${ev.value} = $sig;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** The [[HyperplaneSig]] plane DOTS themselves, un-thresholded, as
  * `ARRAY<BIGINT>` — the Johnson-Lindenstrauss ±1 random projection of the
  * vector (Achlioptas' database-friendly construction: ±1 entries drawn
  * from the same LCG as the signature planes, so projection and signature
  * agree plane-for-plane). Elements quantize ×`scale` first; each
  * coordinate is then an exact, order-independent integer sum the oracle
  * recomputes term-for-term. One native loop, constant-size generated
  * code. */
case class PlaneDots(child: Expression, planes: Int, dim: Int, scale: Long)
  extends UnaryExpression {
  require(scale > 0, "plane_dots requires a positive quantization scale")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"plane_dots requires ARRAY<FLOAT>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "plane_dots"

  private def sgn(i: Int, j: Int): Int =
    if ((((2654435761L * (i.toLong * dim + j) + 40503L) % 4294967296L) >> 16 & 1L) == 0L) -1 else 1

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"plane_dots: vector dim ${v.numElements()} != $dim")
    val out = new Array[Long](planes)
    var i = 0
    while (i < planes) {
      var dot = 0L
      var j = 0
      while (j < dim) {
        if (!v.isNullAt(j)) {
          val xd = v.getFloat(j).toDouble
          dot += (math.signum(xd) * math.floor(math.abs(xd) * scale + 0.5)).toLong * sgn(i, j)
        }
        j += 1
      }
      out(i) = dot
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val (out, i, j, dot, xd, s) = (ctx.freshName("out"), ctx.freshName("i"),
        ctx.freshName("j"), ctx.freshName("dot"), ctx.freshName("xd"), ctx.freshName("s"))
      s"""
         |if ($v.numElements() != $dim) throw new IllegalArgumentException(
         |  "plane_dots: vector dim " + $v.numElements() + " != " + $dim);
         |long[] $out = new long[$planes];
         |for (int $i = 0; $i < $planes; $i++) {
         |  long $dot = 0L;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($v.isNullAt($j)) continue;
         |    long $s = ((((2654435761L * ((long) $i * $dim + $j) + 40503L) % 4294967296L) >> 16) & 1L) == 0L ? -1L : 1L;
         |    double $xd = (double) $v.getFloat($j);
         |    $dot += (long) (Math.signum($xd) * Math.floor(Math.abs($xd) * ${scale}D + 0.5D)) * $s;
         |  }
         |  $out[$i] = $dot;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PlaneDots =
    copy(child = newChild)
}
