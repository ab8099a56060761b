package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{ArrayDot, Bridge, CdcChunks, HyperplaneSig, InterleaveBits, JaroWinklerPpm, PlaneDots, SortedBagIntersectSize, TokenGramHashes, TokenGramStrings}

/** Column-API facade for the native graft expressions. */
object GraftFunctions {
  /** Double dot product of two float-array columns. */
  def arrayDot(a: Column, b: Column): Column =
    Bridge.column(ArrayDot(Bridge.expression(a), Bridge.expression(b), 0L))

  /** Exact scaled-integer dot product (see [[org.apache.spark.sql.graft.ArrayDot]]). */
  def arrayDotScaled(a: Column, b: Column, scale: Long): Column =
    Bridge.column(ArrayDot(Bridge.expression(a), Bridge.expression(b), scale))

  /** Morton/Z-order interleave of two 16-bit keys
    * (see [[org.apache.spark.sql.graft.InterleaveBits]]). */
  def zorder2(x: Column, y: Column): Column =
    Bridge.column(InterleaveBits(Bridge.expression(x), Bridge.expression(y)))

  /** Random-hyperplane LSH signature as one native loop
    * (see [[org.apache.spark.sql.graft.HyperplaneSig]]); `scale > 0`
    * quantizes elements for exact integer plane dots, 0 = double mode. */
  def hyperplaneSig(vec: Column, planes: Int, dim: Int, scale: Long): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(vec), planes, dim, scale))

  /** JL ±1 random-projection coordinates as exact scaled-integer plane dots
    * (see [[org.apache.spark.sql.graft.PlaneDots]]). */
  def planeDots(vec: Column, planes: Int, dim: Int, scale: Long): Column =
    Bridge.column(PlaneDots(Bridge.expression(vec), planes, dim, scale))

  /** Distinct 64-bit token n-gram digests as one native loop — internal
    * join plumbing (see [[org.apache.spark.sql.graft.TokenGramHashes]]). */
  def tokenGramHashes(toks: Column, n: Int): Column =
    Bridge.column(TokenGramHashes(Bridge.expression(toks), n))

  /** Distinct space-joined token n-gram strings as one native loop
    * (see [[org.apache.spark.sql.graft.TokenGramStrings]]). */
  def tokenGrams(toks: Column, n: Int): Column =
    Bridge.column(TokenGramStrings(Bridge.expression(toks), n))

  /** Content-defined chunks of a string column as one native loop
    * (see [[org.apache.spark.sql.graft.CdcChunks]]). */
  def cdcChunks(payload: Column, window: Int, div: Int): Column =
    Bridge.column(CdcChunks(Bridge.expression(payload), window, div))

  /** Multiset-intersection size of two sorted string arrays as one native
    * merge loop (see [[org.apache.spark.sql.graft.SortedBagIntersectSize]]). */
  def sortedBagIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedBagIntersectSize(Bridge.expression(a), Bridge.expression(b)))

  /** Jaro–Winkler similarity ×1e6 as one native comparator
    * (see [[org.apache.spark.sql.graft.JaroWinklerPpm]]). */
  def jaroWinklerPpm(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerPpm(Bridge.expression(a), Bridge.expression(b)))
}

/** SQL-surface registration (`spark.sql.extensions=graft.functions.GraftExtensions`):
  * exposes `array_dot(a, b)` and `array_dot_scaled(a, b)` (×1e8) to SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      Bridge.build("array_dot", 0L) _))
    ext.injectFunction((new FunctionIdentifier("array_dot_scaled"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot_scaled"),
      Bridge.build("array_dot_scaled", 100000000L) _))
    ext.injectFunction((new FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "zorder2"),
      Bridge.buildZorder _))
  }
}
