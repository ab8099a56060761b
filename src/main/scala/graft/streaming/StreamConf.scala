package graft.streaming

import org.apache.spark.sql.SparkSession

/** Stream-state sizing: `spark.sql.shuffle.partitions` at stream START is
  * baked into the query's state-store layout (one store per partition,
  * per operator, touched every micro-batch). The right number tracks
  * KEY CARDINALITY and write throughput, not the batch engine's
  * scan-parallelism default — oversizing multiplies per-batch task and
  * store-commit overhead across every trigger. This helper scopes the
  * setting to a stream's startup and restores the session default after,
  * so batch queries in the same session keep their own sizing. */
object StreamConf {
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }
}
