package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins whose hot keys overwhelm single tasks
  * (SURVEY.md §4 / the 100 TB design point).
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default), which splits oversized sort-merge partitions at runtime.
  * Salting is the explicit fallback for engines/paths AQE doesn't cover or
  * when the small side is replicable: the big side spreads each hot key over
  * `salt` sub-keys (deterministically, from a hash of the whole row), the
  * small side replicates each row `salt` times, and the join key becomes
  * (key, salt) — a hot key's rows now land on `salt` tasks instead of one.
  */
object Skew {

  /** Inner/left equi-join `big ⋈ small` on `key`, salted `salt` ways.
    * `small` is replicated ×salt — size it accordingly. Deterministic: the
    * big side's sub-key comes from xxhash64 of its row, not from rand(). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    val bigCols = big.columns
    val b = big.withColumn("__salt",
      pmod(xxhash64(bigCols.map(col): _*), lit(salt)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
