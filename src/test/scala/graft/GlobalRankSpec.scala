package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rank equals the single-partition row_number on skewed data") {
    // heavy skew: half the keys identical, forcing ties through the
    // range partitioner; doc tiebreak makes the order total
    val df = (1 to 5000)
      .map(i => (i.toLong, if (i % 2 == 0) 7L else (i % 97).toLong))
      .toDF("id", "key")
    val got = GlobalRank.withRank(df, "rk", $"key".desc, $"id".asc)
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    val want = df.orderBy($"key".desc, $"id".asc)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got === want)
  }

  test("rank is a dense 1..n permutation across many partitions") {
    val df = spark.range(0, 20000, 1, 17)
      .select($"id", pmod($"id" * 2654435761L, lit(1000003L)).as("key"))
    val rks = GlobalRank.withRank(df, "rk", $"key".asc, $"id".asc)
      .select($"rk").as[Long].collect().sorted
    assert(rks.head === 1L && rks.last === 20000L)
    assert(rks.length === 20000 && rks.distinct.length === 20000)
  }

  test("no window operator anywhere in the ranked plan") {
    val df = spark.range(0, 1000).select($"id", ($"id" % 13).as("key"))
    val plan = GlobalRank.withRank(df, "rk", $"key".asc, $"id".asc)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank fell back to a window:\n$plan")
  }

  test("t_shard_balance: shards within one max-document in token mass") {
    val out = Queries.queries("t_shard_balance")(spark, TestSpark.sf)
      .groupBy($"shard").agg(sum($"n_tokens").as("mass"),
        max($"n_tokens").as("biggest"))
      .as[(Long, Long, Long)].collect()
    assert(out.length === 8)
    val masses = out.map(_._2)
    val maxDoc = out.map(_._3).max
    assert(masses.max - masses.min <= maxDoc,
      s"imbalance ${masses.max - masses.min} exceeds max doc $maxDoc")
  }
}
