package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct space-joined token `n`-grams of an `ARRAY<STRING>` token
  * column, as one native loop per row — the shingle-string construction
  * behind [[graft.llmops.Dedup.shingleIndex]].
  *
  * Replaces the posexplode → window(`lead`) → concat_ws → global distinct
  * pipeline (one Exchange+Sort for the window and a second Exchange for
  * the distinct, per instantiation) with a zero-shuffle scan-stage
  * expression: the per-doc gram set is tiny, so per-doc dedup inside the
  * row (LinkedHashSet) equals the global (id, s) distinct whenever doc
  * ids are unique — which every caller guarantees. Unlike
  * [[TokenGramHashes]] the output is the EXACT gram strings (they feed
  * declared, oracle-checked Jaccard/containment results), so there is no
  * collision contract to carry. Output order is first occurrence,
  * deterministic. Fewer than n tokens → empty array; null elements are
  * skipped inside a gram exactly like `concat_ws`.
  */
case class TokenGramStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_gram_strings requires ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_gram_strings"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    ArrayData.toArrayData(TokenGramStrings.grams(arr, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("grams")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $out =
         |  org.apache.spark.sql.graft.TokenGramStrings.grams($v, $n);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenGramStrings =
    copy(child = newChild)
}

object TokenGramStrings {
  private val SEP = UTF8String.fromString(" ")
  private val EMPTY = new Array[UTF8String](0)

  /** Distinct n-grams of `arr` in first-occurrence order (shared by the
    * interpreted and generated paths — one static call per row). */
  def grams(arr: ArrayData, n: Int): Array[UTF8String] = {
    val m = arr.numElements()
    if (m < n) return EMPTY
    val toks = new Array[UTF8String](m)
    var k = 0
    while (k < m) {
      toks(k) = if (arr.isNullAt(k)) null else arr.getUTF8String(k)
      k += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (n == 1) {
      var i = 0
      while (i < m) { if (toks(i) != null) seen.add(toks(i)); i += 1 }
    } else {
      val window = new Array[UTF8String](n)
      var i = 0
      while (i <= m - n) {
        var j = 0
        while (j < n) { window(j) = toks(i + j); j += 1 }
        // concatWs skips nulls — same gram text as concat_ws(" ", ...)
        seen.add(UTF8String.concatWs(SEP, window: _*))
        i += 1
      }
    }
    val out = new Array[UTF8String](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }
}
