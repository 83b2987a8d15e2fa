package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs end-to-end on sf0.001 (schema + execution
  * smoke; value correctness is the driver's DuckDB gate at sf0.01). */
class SmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query/oracle key aligns") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle without query: ${os -- qs}")
  }

  Queries.all.foreach { q =>
    test(s"query ${q.name} executes at sf0.001") {
      val df = q.fn(spark, TestSpark.sf)
      assert(df.columns.nonEmpty)
      df.count() // forces full execution
    }
  }
}
