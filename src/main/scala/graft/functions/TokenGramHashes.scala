package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Distinct 64-bit digests of the token `n`-grams of an `ARRAY<STRING>`
  * token column, as one native loop — the allocation-free replacement for
  * the `transform(sequence…) → slice → array_join → array_distinct` HOF
  * chain, whose per-element interpreted lambdas and per-gram string
  * building dominate the streaming decontamination batches.
  *
  * The digest is internal plumbing, never a declared result: both sides of
  * a gram join compute it with THIS expression inside one engine, so gram
  * digest equality stands in for gram string equality (64-bit, first-window
  * polynomial over per-token Murmur3 hashes — collision odds are ~2⁻⁶⁴ per
  * candidate pair, and the DuckDB oracle still checks the RESULT against
  * exact string grams). Output order is first occurrence, deterministic.
  * Fewer than n tokens → empty array.
  */
case class TokenGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_gram_hashes requires ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_gram_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return ArrayData.toArrayData(Array.empty[Long])
    val th = new Array[Long](m)
    var k = 0
    while (k < m) {
      th(k) = if (arr.isNullAt(k)) 0L
        else arr.getUTF8String(k).hashCode().toLong & 0xffffffffL
      k += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= m - n) {
      var h = 1125899906842597L
      var j = i
      while (j < i + n) { h = h * 1000003L + th(j); j += 1 }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val (m, th, k, seen, i, j, h, out, o, it) = (ctx.freshName("m"),
        ctx.freshName("th"), ctx.freshName("k"), ctx.freshName("seen"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("h"),
        ctx.freshName("out"), ctx.freshName("o"), ctx.freshName("it"))
      s"""
         |int $m = $v.numElements();
         |if ($m < $n) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(new long[0]);
         |} else {
         |  long[] $th = new long[$m];
         |  for (int $k = 0; $k < $m; $k++) {
         |    $th[$k] = $v.isNullAt($k) ? 0L
         |      : ((long) $v.getUTF8String($k).hashCode()) & 0xffffffffL;
         |  }
         |  java.util.LinkedHashSet<Long> $seen = new java.util.LinkedHashSet<Long>();
         |  for (int $i = 0; $i <= $m - $n; $i++) {
         |    long $h = 1125899906842597L;
         |    for (int $j = $i; $j < $i + $n; $j++) { $h = $h * 1000003L + $th[$j]; }
         |    $seen.add($h);
         |  }
         |  long[] $out = new long[$seen.size()];
         |  int $o = 0;
         |  java.util.Iterator<Long> $it = $seen.iterator();
         |  while ($it.hasNext()) { $out[$o++] = ((Long) $it.next()).longValue(); }
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenGramHashes =
    copy(child = newChild)
}
