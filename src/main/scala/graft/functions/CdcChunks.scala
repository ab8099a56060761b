package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the rsync/LBFS/restic boundary trick): split a
  * payload at positions where a rolling polynomial hash of the trailing
  * `window` code units hits `0 mod div` — so an insertion or deletion only
  * re-chunks its own neighborhood, where fixed-offset framing
  * ([[graft.llmops.Multimodal.frames]]) shifts EVERY downstream frame and
  * loses all dedup signal past the edit point.
  *
  * Boundary rule (exactly replicable in SQL): at 1-based position
  * i ≥ window, h(i) = Σ_{j=0..window−1} code(i−j)·31^j; cut after i when
  * h(i) % div == 0. The window does NOT reset at a cut (standard CDC —
  * boundaries depend only on local content, which is what makes equal
  * content produce equal chunks regardless of position). Expected chunk
  * length ≈ `div` code units. Empty input → empty array.
  *
  * Contract: code units are Java chars (== code points for BMP text; the
  * corpus contract here is ASCII — the DuckDB oracle's `ord(substr(…))`
  * sees identical codes). One native loop, codegen'd — no per-position
  * lambda allocation, no explode; the chunk array never leaves the scan
  * stage in the dedup queries that consume it.
  */
case class CdcChunks(child: Expression, window: Int, div: Int)
    extends UnaryExpression {
  require(window >= 2, s"window must be >= 2, got $window")
  require(div >= 2, s"div must be >= 2, got $div")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cdc_chunks requires STRING, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val out = new java.util.ArrayList[UTF8String]()
    var start = 0
    var i = window - 1
    while (i < n) {
      var h = 0L
      var p = 1L
      var j = 0
      while (j < window) { h += s.charAt(i - j).toLong * p; p *= 31L; j += 1 }
      if (h % div == 0) {
        out.add(UTF8String.fromString(s.substring(start, i + 1)))
        start = i + 1
      }
      i += 1
    }
    if (start < n) out.add(UTF8String.fromString(s.substring(start, n)))
    ArrayData.toArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val (s, n, out, start, i, h, p, j) = (ctx.freshName("s"),
        ctx.freshName("n"), ctx.freshName("out"), ctx.freshName("start"),
        ctx.freshName("i"), ctx.freshName("h"), ctx.freshName("p"),
        ctx.freshName("j"))
      s"""
         |java.lang.String $s = $v.toString();
         |int $n = $s.length();
         |java.util.ArrayList<org.apache.spark.unsafe.types.UTF8String> $out =
         |  new java.util.ArrayList<org.apache.spark.unsafe.types.UTF8String>();
         |int $start = 0;
         |for (int $i = $window - 1; $i < $n; $i++) {
         |  long $h = 0L;
         |  long $p = 1L;
         |  for (int $j = 0; $j < $window; $j++) {
         |    $h += ((long) $s.charAt($i - $j)) * $p;
         |    $p *= 31L;
         |  }
         |  if ($h % $div == 0) {
         |    $out.add(org.apache.spark.unsafe.types.UTF8String.fromString(
         |      $s.substring($start, $i + 1)));
         |    $start = $i + 1;
         |  }
         |}
         |if ($start < $n) {
         |  $out.add(org.apache.spark.unsafe.types.UTF8String.fromString(
         |    $s.substring($start, $n)));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $out.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
