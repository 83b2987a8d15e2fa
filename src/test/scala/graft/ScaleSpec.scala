package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics of the scale-layout operators: compaction planning and
  * sorted-neighborhood blocking. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction plan tiles the corpus contiguously and conserves bytes") {
    import spark.implicits._
    val files = Queries.queries("s16_compaction_plan")(spark, TestSpark.sf)
      .select($"out_file", $"n_docs", $"file_bytes", $"first_doc", $"last_doc")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(files.length > 1, "target so large the plan is one file")
    // contiguous, ordered, non-overlapping record spans
    files.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4,
        s"file ${b._1} overlaps or reorders: ${a._5} !< ${b._4}")
      case _ =>
    }
    // byte conservation vs the raw corpus
    val total = Tables.load(spark, TestSpark.sf, "documents")
      .agg(sum(octet_length($"text").cast("long"))).as[Long].head()
    assert(files.map(_._3).sum === total)
    // every file except the last closed BECAUSE it crossed its boundary:
    // cumulative bytes at file k's end >= (k+1) * target
    val cum = files.map(_._3).scanLeft(0L)(_ + _).drop(1)
    files.init.zip(cum.init).foreach { case (f, end) =>
      assert(end >= (f._1 + 1) * ScaleQueries.CompactTarget,
        s"file ${f._1} closed early at $end")
    }
  }

  test("s21 CMS join-size estimate never undercounts and is ordered-useful") {
    val got = Queries.queries("s21_join_size_estimate")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set("orders_lineitem", "cust_supp_nation"))
    val sizes = Map(
      "orders_lineitem" ->
        (Tables.load(spark, TestSpark.sf, "orders").count(),
          Tables.load(spark, TestSpark.sf, "lineitem").count()),
      "cust_supp_nation" ->
        (Tables.load(spark, TestSpark.sf, "customer").count(),
          Tables.load(spark, TestSpark.sf, "supplier").count()))
    got.foreach { case (name, (exact, cms)) =>
      // the CMS/AMS guarantee: collisions only ADD mass, never remove it
      assert(cms >= exact, s"$name: estimate $cms undercounts exact $exact")
      // deterministic ceiling: a row's inner product cannot exceed the
      // all-in-one-bucket product of the two table sizes
      val (nl, nr) = sizes(name)
      assert(cms <= nl * nr, s"$name: estimate $cms exceeds |L|x|R|")
      // additive-error shape: inflation is bounded by the CMS error term
      // |L|*|R|/W per colliding pair, comfortably within 2x of it
      assert(cms - exact <= 2L * nl * nr / TextQueries.CmsW,
        s"$name: inflation ${cms - exact} above the |L||R|/W error shape")
    }
    // the blowup probe (tiny key domain: every key collides with itself
    // only) estimates near-exactly — the planner can trust its magnitude
    val (bx, bc) = got("cust_supp_nation")
    assert(bc - bx <= bx / 2, s"blowup probe inflated: exact $bx cms $bc")
  }

  test("sorted-neighborhood pairs are exact matches and a subset of j17") {
    import spark.implicits._
    val snm = Queries.queries("j18_sorted_neighborhood")(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(snm.nonEmpty, "window found no candidates at all")
    assert(snm.forall(_._3 <= 1L), "verification let a far pair through")
    // the deletion-neighborhood join (j17) is COMPLETE for distance <= 1,
    // so SNM's window recall can only lose pairs, never invent them
    val full = Queries.queries("j17_fuzzy_join")(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(snm.subsetOf(full), s"SNM invented pairs: ${snm.diff(full).take(3)}")
  }
}
