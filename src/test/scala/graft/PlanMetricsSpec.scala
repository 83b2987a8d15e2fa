package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PlanMetrics

class PlanMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("shuffle metrics of an executed aggregation are visible") {
    val df = Queries.queries("q1_agg")(spark, TestSpark.sf)
    df.collect() // execute THIS plan so its SQLMetrics carry values
    val m = PlanMetrics.summarize(df)
    assert(m.shuffles >= 1, "groupBy must shuffle")
    assert(m.shuffleRecords > 0L && m.shuffleBytes > 0L)
    assert(m.peakNodeOutputRows > 0L)
    assert(m.spillBytes === 0L, "sf0.001 must not spill")
  }

  test("a scan-only projection reports zero shuffles") {
    import spark.implicits._
    val df = Tables.load(spark, TestSpark.sf, "region")
      .select($"r_regionkey")
    df.collect()
    val m = PlanMetrics.summarize(df)
    assert(m.shuffles === 0)
    assert(m.shuffleBytes === 0L)
  }

  test("the salted join's extra exchange shows up in the summary") {
    val df = Queries.queries("j16_salted_join")(spark, TestSpark.sf)
    df.collect()
    val m = PlanMetrics.summarize(df)
    // both join sides shuffle on (key, salt), plus the final agg
    assert(m.shuffles >= 2, s"expected the salted exchanges, got $m")
  }
}
