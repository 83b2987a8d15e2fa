package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN recall property: multi-probe can only widen the candidate set. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("multi-probe top-1 is never worse than single-probe top-1") {
    import spark.implicits._
    def top1(name: String): Map[Long, Long] =
      Queries.queries(name)(spark, TestSpark.sf)
        .filter($"rank" === 1)
        .select($"query_id".cast("long"), $"cos_milli".cast("long"))
        .as[(Long, Long)].collect().toMap
    val single = top1("v2_ann_lsh")
    val multi = top1("v3_ann_multiprobe")
    // every query the single-probe answered is answered at least as well
    single.foreach { case (q, cos) =>
      assert(multi.contains(q) && multi(q) >= cos,
        s"query $q: multi=${multi.get(q)} < single=$cos")
    }
    assert(multi.size >= single.size) // and possibly more queries answered
  }
}
