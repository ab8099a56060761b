package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the SCALE.md claims: predicate pushdown and column
  * pruning reach the parquet scans, dimension joins broadcast, and the
  * pairwise probes spread round-robin — asserted on the DECLARED queries'
  * plans, so a plan regression fails the suite, not just the bench. */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02: filter predicates push down into the parquet scan") {
    val p = plan("q02_filter_predicates")
    assert(p.contains("PushedFilters: [IsNotNull"), p.linesIterator.take(30).mkString("\n"))
  }

  test("q01: column pruning — unreferenced lineitem columns never scanned") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment") && !p.contains("l_orderkey"),
      "scan reads columns the query never references")
  }

  test("q03: dimension join is a broadcast hash join") {
    assert(plan("q03_broadcast_join").contains("BroadcastHashJoin"))
  }

  test("q38: pair generation is broadcast-probed with round-robin spread") {
    val p = plan("q38_edit_distance")
    assert(p.contains("BroadcastHashJoin"), "dim side must broadcast")
    assert(p.contains("RoundRobinPartitioning"), "probe side must repartition round-robin")
  }

  test("q27: fused array_dot expression scores pairs (no posexplode detour)") {
    val p = plan("q27_cosine_topk")
    assert(p.contains("array_dot"), "cosine should use the native fused expression")
    assert(!p.contains("PosExplode"), "dot products must not explode to element rows")
  }
}
