package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native quantization expressions for the IVF-PQ index
  * (graft.llmops.Similarity.cosineTopKIvfPq).
  *
  * Why native: the declarative formulation — one fused dot per (subspace,
  * centroid) — unrolls m·ksub expression subtrees into ONE generated
  * `processNext()`. At m=8, ksub=16 that method passes 10k lines and janino
  * rejects it, silently dropping the entire encode stage to interpreted
  * eval (the failure mode documented in SCALE.md). These expressions emit
  * the loops INSTEAD of unrolling them: code size is constant in m, ksub
  * and nlist, the codebooks ride the reference array (not the source text),
  * and the stage stays inside whole-stage codegen at any quantizer size.
  *
  * All four follow ArrayDot's null discipline (null elements contribute 0,
  * identical in interpreted and generated paths) and raise on dimension
  * mismatch rather than silently truncating.
  */

/** argmin over `centroids` of ||v − c||² for an ARRAY<FLOAT> vector column,
  * computed as argmin(|c|² − 2·v·c); ties resolve to the lowest centroid
  * index (strict less-than). Returns INT. */
case class ArgminCell(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression {

  private val dim = centroids(0).length
  private lazy val cn2: Array[Double] = centroids.map(_.map(x => x * x).sum)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"argmin_cell requires ARRAY<FLOAT>, got $t")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmin_cell"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"argmin_cell: vector dim ${v.numElements()} != centroid dim $dim")
    var best = Double.PositiveInfinity
    var bi = 0
    var ci = 0
    while (ci < centroids.length) {
      val c = centroids(ci)
      var dot = 0.0
      var j = 0
      while (j < dim) {
        if (!v.isNullAt(j)) dot += c(j) * v.getFloat(j)
        j += 1
      }
      val dist = cn2(ci) - 2.0 * dot
      if (dist < best) { best = dist; bi = ci }
      ci += 1
    }
    bi
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val norms = ctx.addReferenceObj("cn2", cn2, "double[]")
      val (best, bi, ci, j, dot, dist) = (ctx.freshName("best"), ctx.freshName("bi"),
        ctx.freshName("ci"), ctx.freshName("j"), ctx.freshName("dot"), ctx.freshName("dist"))
      s"""
         |if ($v.numElements() != $dim) throw new IllegalArgumentException(
         |  "argmin_cell: vector dim " + $v.numElements() + " != centroid dim " + $dim);
         |double $best = Double.POSITIVE_INFINITY;
         |int $bi = 0;
         |for (int $ci = 0; $ci < ${centroids.length}; $ci++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if (!$v.isNullAt($j)) $dot += $cents[$ci][$j] * (double) $v.getFloat($j);
         |  }
         |  double $dist = $norms[$ci] - 2.0 * $dot;
         |  if ($dist < $best) { $best = $dist; $bi = $ci; }
         |}
         |${ev.value} = $bi;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArgminCell =
    copy(child = newChild)
}

/** Product-quantization encode of the CELL RESIDUAL (v − c_cell), the
  * standard IVFADC composition: for each of the m subspaces, the index of
  * the codebook centroid minimizing ||(v − c_cell)_sub − c||², computed up
  * to the per-point constant as |c|² − 2·v_sub·c + 2·(c_cell)_sub·c — the
  * third term is a precomputed (subspace, centroid, cell) table, so the
  * residual itself is never materialized. Ties resolve to the lowest
  * centroid index. `left` = ARRAY<FLOAT> vector, `right` = INT cell id.
  * Returns ARRAY<INT> of m codes. */
case class PqEncode(left: Expression, right: Expression,
    coarse: Array[Array[Double]], books: Array[Array[Array[Double]]])
  extends BinaryExpression {

  private val m = books.length
  private val subDim = books(0)(0).length
  private val ksub = books(0).length
  private val dim = coarse(0).length
  private lazy val cn2: Array[Array[Double]] =
    books.map(_.map(_.map(x => x * x).sum))
  // cellDots(si)(ci)(cell) = Σ_j coarse(cell)(si·subDim + j) · book(si)(ci)(j)
  private lazy val cellDots: Array[Array[Array[Double]]] =
    Array.tabulate(m, ksub, coarse.length) { (si, ci, cell) =>
      var s = 0.0
      var j = 0
      while (j < subDim) {
        s += coarse(cell)(si * subDim + j) * books(si)(ci)(j)
        j += 1
      }
      s
    }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires (ARRAY<FLOAT>, INT), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(vecIn: Any, cellIn: Any): Any = {
    val v = vecIn.asInstanceOf[ArrayData]
    val cell = cellIn.asInstanceOf[Int]
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"pq_encode: vector dim ${v.numElements()} != $dim")
    val codes = new Array[Int](m)
    var si = 0
    while (si < m) {
      var best = Double.PositiveInfinity
      var bi = 0
      var ci = 0
      while (ci < ksub) {
        val c = books(si)(ci)
        var dot = 0.0
        var j = 0
        while (j < subDim) {
          val idx = si * subDim + j
          if (!v.isNullAt(idx)) dot += c(j) * v.getFloat(idx)
          j += 1
        }
        val dist = cn2(si)(ci) - 2.0 * dot + 2.0 * cellDots(si)(ci)(cell)
        if (dist < best) { best = dist; bi = ci }
        ci += 1
      }
      codes(si) = bi
      si += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cell) => {
      val bk = ctx.addReferenceObj("books", books, "double[][][]")
      val n2 = ctx.addReferenceObj("cn2", cn2, "double[][]")
      val cd = ctx.addReferenceObj("cellDots", cellDots, "double[][][]")
      val (codes, si, ci, j, dot, dist, best, bi, idx) = (ctx.freshName("codes"),
        ctx.freshName("si"), ctx.freshName("ci"), ctx.freshName("j"), ctx.freshName("dot"),
        ctx.freshName("dist"), ctx.freshName("best"), ctx.freshName("bi"), ctx.freshName("idx"))
      s"""
         |if ($v.numElements() != $dim) throw new IllegalArgumentException(
         |  "pq_encode: vector dim " + $v.numElements() + " != " + $dim);
         |int[] $codes = new int[$m];
         |for (int $si = 0; $si < $m; $si++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bi = 0;
         |  for (int $ci = 0; $ci < $ksub; $ci++) {
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      int $idx = $si * $subDim + $j;
         |      if (!$v.isNullAt($idx)) $dot += $bk[$si][$ci][$j] * (double) $v.getFloat($idx);
         |    }
         |    double $dist = $n2[$si][$ci] - 2.0 * $dot + 2.0 * $cd[$si][$ci][(int) $cell];
         |    if ($dist < $best) { $best = $dist; $bi = $ci; }
         |  }
         |  $codes[$si] = $bi;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** Per-subspace ADC lookup tables for a query vector: tabs[si][ci] =
  * dot(query subvector si, codebook centroid ci), so the approximate dot of
  * (query, candidate) is Σ_si tabs[si][codes[si]] ([[PqAdcScore]]).
  * Returns ARRAY<ARRAY<DOUBLE>> (m × ksub). */
case class PqAdcTables(child: Expression, books: Array[Array[Array[Double]]])
  extends UnaryExpression {

  private val m = books.length
  private val subDim = books(0)(0).length
  private val ksub = books(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_tables requires ARRAY<FLOAT>, got $t")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_tables"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * subDim) throw new IllegalArgumentException(
      s"pq_adc_tables: vector dim ${v.numElements()} != ${m * subDim}")
    val rows = new Array[ArrayData](m)
    var si = 0
    while (si < m) {
      val tab = new Array[Double](ksub)
      var ci = 0
      while (ci < ksub) {
        val c = books(si)(ci)
        var dot = 0.0
        var j = 0
        while (j < subDim) {
          val idx = si * subDim + j
          if (!v.isNullAt(idx)) dot += c(j) * v.getFloat(idx)
          j += 1
        }
        tab(ci) = dot
        ci += 1
      }
      rows(si) = new GenericArrayData(tab)
      si += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bk = ctx.addReferenceObj("books", books, "double[][][]")
      val (rows, tab, si, ci, j, dot, idx) = (ctx.freshName("rows"), ctx.freshName("tab"),
        ctx.freshName("si"), ctx.freshName("ci"), ctx.freshName("j"), ctx.freshName("dot"),
        ctx.freshName("idx"))
      s"""
         |if ($v.numElements() != ${m * subDim}) throw new IllegalArgumentException(
         |  "pq_adc_tables: vector dim " + $v.numElements() + " != " + ${m * subDim});
         |org.apache.spark.sql.catalyst.util.ArrayData[] $rows =
         |  new org.apache.spark.sql.catalyst.util.ArrayData[$m];
         |for (int $si = 0; $si < $m; $si++) {
         |  double[] $tab = new double[$ksub];
         |  for (int $ci = 0; $ci < $ksub; $ci++) {
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      int $idx = $si * $subDim + $j;
         |      if (!$v.isNullAt($idx)) $dot += $bk[$si][$ci][$j] * (double) $v.getFloat($idx);
         |    }
         |    $tab[$ci] = $dot;
         |  }
         |  $rows[$si] = new org.apache.spark.sql.catalyst.util.GenericArrayData($tab);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $rows);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdcTables =
    copy(child = newChild)
}

/** ADC score: Σ_si tabs[si][codes[si]] — the m-lookup approximate dot.
  * `left` = ARRAY<ARRAY<DOUBLE>> tables, `right` = ARRAY<INT> codes.
  * Returns DOUBLE. */
case class PqAdcScore(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score requires (ARRAY<ARRAY<DOUBLE>>, ARRAY<INT>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(tabsIn: Any, codesIn: Any): Any = {
    val tabs = tabsIn.asInstanceOf[ArrayData]
    val codes = codesIn.asInstanceOf[ArrayData]
    if (tabs.numElements() != codes.numElements()) throw new IllegalArgumentException(
      s"pq_adc_score: ${tabs.numElements()} tables vs ${codes.numElements()} codes")
    var s = 0.0
    var si = 0
    while (si < codes.numElements()) {
      s += tabs.getArray(si).getDouble(codes.getInt(si))
      si += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tabs, codes) => {
      val (s, si) = (ctx.freshName("s"), ctx.freshName("si"))
      s"""
         |if ($tabs.numElements() != $codes.numElements()) throw new IllegalArgumentException(
         |  "pq_adc_score: " + $tabs.numElements() + " tables vs " + $codes.numElements() + " codes");
         |double $s = 0.0;
         |for (int $si = 0; $si < $codes.numElements(); $si++) {
         |  $s += $tabs.getArray($si).getDouble($codes.getInt($si));
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}
