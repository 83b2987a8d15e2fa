package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties .explain audits
  * verified (pushdown, pruning, broadcast) must survive refactors. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def planOf(name: String): String =
    Queries.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("scan queries push filters into the parquet scan") {
    val p = planOf("s1_scan_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"missing pushdown:\n$p")
  }

  test("scan queries prune columns (no full-width read)") {
    val p = planOf("s1_scan_pushdown")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_returnflag"), "pruned column still read")
  }

  test("dimension joins broadcast the small sides") {
    val p = planOf("q3_revenue_nation_year")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("aggregations are partial (map-side combine before exchange)") {
    val p = planOf("q1_agg")
    // partial + final HashAggregate pair around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("Exchange"))
  }

  test("geometry arbitration stays inside codegen (no UDF in the plan)") {
    val p = planOf("f10_geometry_merge")
    assert(!p.contains("UDF"), s"Scala UDF escaped codegen:\n$p")
  }

  test("substrate eviction unpersists and the cache rebuilds lazily") {
    val (e1, _) = LuxQueries.substrate(spark, TestSpark.sf)
    val (e2, _) = LuxQueries.substrate(spark, TestSpark.sf)
    assert(e1 eq e2) // cached: same persisted instance
    LuxQueries.evictSubstrate(spark)
    assert(e1.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val (e3, _) = LuxQueries.substrate(spark, TestSpark.sf)
    assert(!(e3 eq e1)) // rebuilt fresh after eviction
    LuxQueries.evictSubstrate(spark) // leave the session clean
  }
}
