package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.JoinPlanner.Config

/** The JoinPlanner's production adoption (round-14 verdict item 2): the
  * build chain's reference-rewrite gather runs through planJoin. Pins
  * the chosen physical shape per data regime — broadcast on the
  * reach-bounded fixture, shuffle-hash when the members side outgrows
  * the budget, salt when the probe is hot-keyed — plus the config-flag
  * rollback and result equality against the plain join in every branch.
  * (The decision arithmetic itself is JoinPlannerSpec's; this spec pins
  * the ADOPTION: the gather call site honors the pick and the flag.) */
class GatherPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // fixture-scaled thresholds, the Config scaladoc's intended use
  private val cfg = Config(broadcastMaxRows = 64L, skewShareMilli = 200L,
    saltTargetPartitions = 32, maxSalt = 32)

  private def refs(hot: Boolean): DataFrame =
    (1 to 5000).map(i =>
      (if (hot && i % 10 < 9) 0L else (i % 100).toLong, (i % 7).toLong))
      .toDF("k", "sk")

  private def plain(r: DataFrame, m: DataFrame) =
    r.join(m, "k").agg(count(lit(1)), sum($"sk")).head()

  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("gather: reach-bounded members side → broadcast, probe unshuffled") {
    val members = (0L until 50L).map(k => (k, k * 8L + 2L)).toDF("k", "yuid")
    val g = BuildChainQueries.gatherRefs(refs(hot = false), members, cfg)
    val plan = executed(g)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
    assert(g.agg(count(lit(1)), sum($"sk")).head() === plain(refs(hot = false), members))
  }

  test("gather: members past the budget → shuffle-hash, never sort-merge") {
    val members = (0L until 100L).map(k => (k, k * 8L + 2L)).toDF("k", "yuid")
    val g = BuildChainQueries.gatherRefs(refs(hot = false), members, cfg)
    val plan = executed(g)
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffle-hash:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"sort-merge crept in:\n$plan")
    assert(g.agg(count(lit(1)), sum($"sk")).head() === plain(refs(hot = false), members))
  }

  test("gather: hot-keyed probe → salted join on (k, salt)") {
    val members = (0L until 100L).map(k => (k, k * 8L + 2L)).toDF("k", "yuid")
    val g = BuildChainQueries.gatherRefs(refs(hot = true), members, cfg)
    val plan = executed(g)
    val joinLine = plan.linesIterator.find(_.contains("ShuffledHashJoin"))
    assert(joinLine.exists(_.contains("salt")),
      s"expected salt in the join keys:\n$plan")
    assert(g.agg(count(lit(1)), sum($"sk")).head() === plain(refs(hot = true), members))
  }

  test("gather: the config flag reverts to the plain Catalyst join") {
    spark.conf.set("spark.graft.joinPlanner.enabled", "false")
    try {
      val members = (0L until 100L).map(k => (k, k * 8L + 2L)).toDF("k", "yuid")
      val g = BuildChainQueries.gatherRefs(refs(hot = true), members, cfg)
      assert(!executed(g).contains("salt"),
        "flag off must bypass the planner entirely")
      assert(g.agg(count(lit(1)), sum($"sk")).head() === plain(refs(hot = true), members))
    } finally spark.conf.unset("spark.graft.joinPlanner.enabled")
  }
}
