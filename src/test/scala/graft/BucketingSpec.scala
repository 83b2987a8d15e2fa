package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed co-located joins (SURVEY §4 partitioning strategy): writing
  * both join sides bucketed on the key lets the join run without any
  * Exchange — the 100 TB path for repeated large-large joins (idmap x
  * recordcaches). Asserted on the physical plan. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.load(spark, TestSpark.sf, "orders")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.load(spark, TestSpark.sf, "customer")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: no shuffle before the join (only possibly for the agg,
    // which reuses the bucket partitioning too)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in plan:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
  }

  test("s15 joins bucketed scans with no exchange below the join") {
    val df = Queries.queries("s15_bucketed_join")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    // the only shuffle is the groupBy(o_custkey) ABOVE the join — the
    // join itself runs on the co-located bucket layout
    val exchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 agg exchange, got $exchanges:\n$plan")
  }

  test("s15 concurrent invocations share one fixture without racing") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fn = Queries.queries("s15_bucketed_join")
    val counts = Await.result(
      Future.sequence(Seq.fill(2)(Future(fn(spark, TestSpark.sf).count()))),
      5.minutes)
    assert(counts.distinct.size == 1, s"divergent results: $counts")
    assert(counts.head > 0)
  }
}
