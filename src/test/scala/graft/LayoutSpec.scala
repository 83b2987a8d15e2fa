package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Z-order layout: prefix buckets must box BOTH dimensions — the
  * property that makes morton-ordered files prunable on either key,
  * where a lexicographic layout prunes only on its leading column. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every morton prefix bucket bounds both dimensions") {
    import spark.implicits._
    val rows = Queries.queries("s13_zorder_layout")(spark, TestSpark.sf)
      .select($"bucket", $"pk_hi" - $"pk_lo", $"sk_hi" - $"sk_lo")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, pkSpan, skSpan) =>
      assert(pkSpan <= 63 && skSpan <= 63, s"bucket $b box $pkSpan x $skSpan")
    }
  }

  test("morton chunks skip on the second key; lexicographic cannot") {
    import spark.implicits._
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select(($"l_partkey" % 256).cast("long").as("pk"),
        ($"l_orderkey" % 256).cast("long").as("sk"))
    // the same 16-way chunking, once by morton prefix, once by pk range
    val mortonSpans = Queries.queries("s13_zorder_layout")(spark, TestSpark.sf)
      .select($"sk_hi" - $"sk_lo").as[Long].collect()
    val lexSpans = li.withColumn("bucket", shiftright($"pk", 4)) // pk-leading
      .groupBy($"bucket").agg((max($"sk") - min($"sk")).as("span"))
      .select($"span").as[Long].collect()
    // average second-key span per chunk: morton boxes it, pk-sort leaves
    // the full domain in every chunk
    val mAvg = mortonSpans.sum.toDouble / mortonSpans.length
    val lAvg = lexSpans.sum.toDouble / lexSpans.length
    assert(mAvg * 2 < lAvg,
      s"no skipping advantage: morton avg $mAvg vs lexicographic avg $lAvg")
  }
}
