package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate operators with exact rescore — the
  * two-pass shape every heavy aggregation takes at 100 TB: a fixed-size
  * sketch pass bounds the shuffle, an exact pass over the (tiny) candidate
  * set restores exactness. Same philosophy as the capped-then-rescored
  * Jaccard join (graft.llmops.Dedup.jaccardPairs).
  */
object Sketches {

  /** Count-min sketch of `keyCol` frequencies: `depth` hash rows ×
    * `width` buckets, as a DataFrame (d, b, c) with c = Σ multiplicity of
    * keys hashing to bucket b in row d. The groupBy is map-side-combined
    * into ≤ depth·width groups per task, so the SHUFFLE is fixed-size
    * (depth·width·|partitions| rows at worst) no matter how many rows or
    * distinct keys flow in — that is the whole point of sketching here. */
  def countMin(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    val buckets = array((0 until depth).map(d => bucket(d, col(keyCol), width)): _*)
    df.select(posexplode(buckets).as(Seq("d", "b")))
      .groupBy("d", "b").agg(count(lit(1)).as("c"))
  }

  private def bucket(d: Int, key: Column, width: Int): Column =
    pmod(xxhash64(lit(d), key), lit(width.toLong))

  /** Exact heavy hitters via CMS candidates + exact rescore: all keys of
    * `facts.keyCol` occurring ≥ `minCount` times, with their EXACT counts.
    *
    * `dimKeys` is the candidate key universe (e.g. the dimension table the
    * key references) with a column named `keyCol`. Pass 1 sketches the fact
    * stream (fixed-size shuffle, see [[countMin]]); each candidate key's
    * estimate = min over depth rows of its bucket count, which NEVER
    * underestimates (count-min guarantee), so `est >= minCount` keeps a
    * superset of the true heavy keys. Pass 2 exact-counts only facts whose
    * key survived — a semi-join against the (small) candidate set — and
    * applies the threshold exactly. Result: exact, with neither pass
    * shuffling the full key universe. */
  def heavyHitters(facts: DataFrame, keyCol: String, dimKeys: DataFrame,
      minCount: Long, depth: Int = 3, width: Int = 1024): DataFrame = {
    val sketch = countMin(facts, keyCol, depth, width)
    // estimate per candidate key: depth broadcast lookups, min-combined
    val est = (0 until depth).foldLeft(
        dimKeys.select(col(keyCol)).distinct()
          .withColumn("__est", lit(Long.MaxValue))) { (acc, d) =>
      val row = sketch.filter(col("d") === d).select(col("b").as("__b"), col("c").as("__c"))
      acc.withColumn("__b", bucket(d, col(keyCol), width))
        .join(broadcast(row), Seq("__b"), "left")
        .withColumn("__est", least(col("__est"), coalesce(col("__c"), lit(0L))))
        .drop("__b", "__c")
    }
    val cand = est.filter(col("__est") >= minCount).select(keyCol)
    facts.select(col(keyCol))
      .join(cand, Seq(keyCol), "left_semi")
      .groupBy(keyCol).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }
}
