package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity ×1e6 as a BIGINT, as one native expression —
  * the record-linkage comparator (Winkler prefix scale 0.1, boost
  * threshold 0.7, prefix cap 4, the textbook parameterization that
  * DuckDB's `jaro_winkler_similarity` also implements: verified
  * bit-compatible over 3,000 random fuzz pairs plus every blocked pair in
  * the declared data at a 1e-7 ppm-boundary margin — see
  * JaroWinklerSpec). Matches DuckDB's empty-string convention (either
  * side empty → 0, even when both are). The double arithmetic runs in a
  * fixed operation order from exact integer match/transposition counts,
  * and only the ×1e6-quantized value is ever gated (the q55 ln
  * discipline). Codegen emits one static call, so the comparator stays
  * inside whole-stage codegen instead of falling back to an interpreted
  * UDF. Comparison is per UTF-8 BYTE, directly on the UTF8String storage —
  * the same unit DuckDB's comparator uses, so parity holds for non-ASCII
  * input too (not just the ASCII linkage columns), and the hot path
  * allocates no per-row java.lang.String. */
case class JaroWinklerPpm(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler_ppm requires (STRING, STRING), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler_ppm"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jwPpm(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.JaroWinklerImpl.jwPpm($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerPpm =
    copy(left = newLeft, right = newRight)
}

/** Shared scalar core: interpreted eval and generated code call the SAME
  * method, so there is exactly one arithmetic sequence to certify. */
object JaroWinklerImpl {
  /** Hot path — compares the UTF8String's UTF-8 bytes in place. */
  def jwPpm(a: UTF8String, b: UTF8String): Long = jwBytes(a.getBytes, b.getBytes)

  /** Spec/JVM-string entry: same byte comparison after UTF-8 encoding. */
  def jwPpm(s1: String, s2: String): Long =
    jwBytes(s1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      s2.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def jwBytes(s1: Array[Byte], s2: Array[Byte]): Long = {
    val l1 = s1.length
    val l2 = s2.length
    // DuckDB convention: any empty side scores 0, even "" vs ""
    if (l1 == 0 || l2 == 0) return 0L
    if (java.util.Arrays.equals(s1, s2)) return 1000000L
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0L
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // fixed double sequence (matches the fuzz-verified reference order)
    var j0 = (matches.toDouble / l1 + matches.toDouble / l2 +
      (matches - t).toDouble / matches) / 3.0
    if (j0 > 0.7) {
      var pl = 0
      val cap = math.min(4, math.min(l1, l2))
      var p = 0
      var stop = false
      while (p < cap && !stop) {
        if (s1(p) == s2(p)) pl += 1 else stop = true
        p += 1
      }
      j0 = j0 + pl * 0.1 * (1.0 - j0)
    }
    math.floor(j0 * 1000000.0 + 0.5).toLong
  }
}
