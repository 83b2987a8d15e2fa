package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("running sum equals the single-partition window on skewed data") {
    // half the sort keys collide so ties must split across range bounds
    val df = (1 to 5000)
      .map(i => (i.toLong, if (i % 2 == 0) 7L else (i % 97).toLong,
        (i % 13).toLong))
      .toDF("id", "key", "v")
    val got = PrefixSum.withRunningSum(df, "v", "cum", $"key".asc, $"id".asc)
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    val want = df.orderBy($"key".asc, $"id".asc).collect()
      .scanLeft((0L, 0L)) { case ((_, acc), r) =>
        (r.getLong(0), acc + r.getLong(2))
      }.drop(1).toMap
    assert(got === want)
  }

  test("running max matches the driver-side scan under a shuffled order") {
    import graft.operators.PrefixSum
    import spark.implicits._
    val r = new scala.util.Random(42)
    val df = (1 to 5000)
      .map(i => (i.toLong, r.nextLong() % 1000000L))
      .toDF("id", "v")
    val got = PrefixSum.withRunningMax(df, "v", "rmax", $"id".asc)
      .select($"id", $"rmax").as[(Long, Long)].collect().toMap
    val want = df.orderBy($"id".asc).collect()
      .scanLeft((0L, Long.MinValue)) { case ((_, acc), row) =>
        (row.getLong(0), math.max(acc, row.getLong(1)))
      }.drop(1).toMap
    assert(got === want)
  }

  test("grouped running sum equals the per-group window, negatives and nulls included") {
    // negatives break the old min(run - v) offset derivation (the
    // running sum is no longer monotone within a group); null VALUES
    // must contribute 0 but never become the offset anchor; null GROUP
    // keys form one ordinary partition (window semantics) — a plain
    // equi-join on the group column would silently drop them
    val rows = (1 to 4000).map { i =>
      val v: java.lang.Long =
        if (i % 29 == 0) null
        else java.lang.Long.valueOf((i % 11).toLong - 4L) // mixed sign
      val g = if (i % 13 == 0) null else s"src${i % 7}"
      (i.toLong, g, v)
    }
    val df = rows.toDF("id", "grp", "v")
    val out = PrefixSum.withGroupedRunningSum(df, "v", "cum", "grp", $"id")
      .select($"id", $"cum").as[(Long, Option[Long])].collect()
    assert(out.length === rows.length) // null-group rows NOT dropped
    val got = out.toMap
    val want = rows.groupBy(_._2).values.flatMap { g =>
      g.sortBy(_._1).scanLeft((0L, 0L)) { case ((_, acc), (id, _, v)) =>
        (id, acc + (if (v == null) 0L else v.longValue))
      }.drop(1)
    }.map { case (id, c) => (id, Some(c)) }.toMap
    assert(got === want)
  }

  test("no window operator and no single-partition stage in the plan") {
    val df = spark.range(0, 20000, 1, 17)
      .select($"id", pmod($"id" * 2654435761L, lit(1000003L)).as("key"),
        ($"id" % 5).as("v"))
    val summed = PrefixSum.withRunningSum(df, "v", "cum", $"key".asc, $"id".asc)
    val plan = summed.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"fell back to a window:\n$plan")
    // total conservation across the partition-offset handoff
    val total = summed.agg(max($"cum")).as[Long].head()
    assert(total === (0L until 20000L).map(_ % 5).sum)
  }
}
