package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count independence — the SCALE.md "numeric determinism"
  * claim made executable: hash-compared queries must produce IDENTICAL
  * bytes whether the plan runs over 2 partitions or 9 (stand-ins for 32
  * locally vs 20k on a cluster). The sweep enumerates the WHOLE declared
  * surface straight from `SparkEntry.queries`, so a new query is pinned
  * the moment it is registered — no hand-maintained list to drift. Every
  * determinism mechanism rides through here: decimal-exact money,
  * scaled-int cosine, quantized TF-IDF, md5-derived sketches, epoch-µs
  * windows, closed-form ANN index internals, doubled-rank tie algebra,
  * and the staged TxStore / streaming replay paths.
  */
class DeterminismSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(q: String, parts: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val df: DataFrame = SparkEntry.queries(q)(spark, sf)
      // canonical form: sorted column names, row values stringified, sorted
      val cols = df.columns.sorted.toIndexedSeq
      df.selectExpr(cols.map(c => s"`$c`"): _*)
        .collect().map(_.mkString("")).sorted.toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (q <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$q: identical bytes at 2 and 9 shuffle partitions") {
      assert(rows(q, 2) == rows(q, 9), s"$q result depends on partitioning")
    }
  }
}
