package graft

/** Physical-plan assertions: the scale properties the engine relies on
  * (scan pushdown, broadcast joins, partial aggregation) must actually
  * appear in the optimized plans — not just be intended. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("s8: filter and projection reach the parquet scan") {
    val p = plan("s8_scan_project")
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      s"expected pushed filter on l_quantity in:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_shipdate"),
      "projection should prune unused columns")
  }

  test("j6: dimension side is broadcast, not shuffled") {
    val p = plan("j6_equi_join")
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$p")
  }

  test("j4: anti join planned as broadcast/shuffled hash anti join") {
    val p = plan("j4_left_anti")
    assert(p.contains("LeftAnti"), s"expected LeftAnti in:\n$p")
  }

  test("a2: aggregation is partial (map-side combine) + final") {
    val p = plan("a2_pricing_summary")
    assert(p.contains("partial_"), s"expected partial aggregation in:\n$p")
  }

  test("j1: candidate side broadcast; no shuffle of the scored pairs") {
    val p = plan("j1_similarity_join")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n$p")
  }

  test("whole-stage codegen spans exist in the relational core") {
    // under AQE the final plan (with codegen stages) exists only after execution
    def executedString(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // codegen stages render as "*(n)" in the plan string
    assert(executedString("a2_pricing_summary").contains("*("))
    assert(executedString("s8_scan_project").contains("*("))
  }
}
