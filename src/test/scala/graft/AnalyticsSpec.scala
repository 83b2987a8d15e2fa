package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics of the funnel / cohort analytics queries. */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("funnel steps shrink monotonically and start non-empty") {
    import spark.implicits._
    val steps = Queries.queries("w9_funnel_steps")(spark, TestSpark.sf)
      .as[(String, Long)].collect().sortBy(_._1).map(_._2)
    assert(steps.length === 3)
    assert(steps(0) > 0L, "no users entered the funnel")
    assert(steps(0) >= steps(1) && steps(1) >= steps(2),
      s"funnel grew: ${steps.mkString(" -> ")}")
  }

  test("cohort retention: offset 0 equals the cohort size") {
    import spark.implicits._
    val ret = Queries.queries("w10_cohort_retention")(spark, TestSpark.sf)
      .select($"cohort_day".cast("string"), $"day_offset", $"n_users")
      .as[(String, Long, Long)].collect()
    assert(ret.nonEmpty)
    // day 0 row exists for every cohort (each member is active on the
    // day that DEFINES the cohort) and no offset exceeds its cohort's
    // day-0 count
    val day0 = ret.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    val cohorts = ret.map(_._1).distinct
    assert(cohorts.forall(day0.contains), "cohort missing its day-0 row")
    ret.foreach { case (c, off, n) =>
      assert(n <= day0(c), s"cohort $c offset $off: $n > day0 ${day0(c)}")
    }
  }

  test("equi-depth buckets hold equal row counts within one") {
    import spark.implicits._
    val rows = Queries.queries("t_equidepth_hist")(spark, TestSpark.sf)
      .select($"bucket", $"n_rows", $"v_lo", $"v_hi")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0L until 16L))
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1L, s"depths ${sizes.mkString(",")}")
    // bucket value ranges are ordered and non-overlapping
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"overlap at bucket ${b._1}")
      case _ =>
    }
  }

  test("weighted sample is the exact ticket-lottery top-N and skews heavy") {
    import spark.implicits._
    val got = Queries.queries("t_weighted_sample")(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    assert(got.length === TextQueries.WrsN)
    // recompute the lottery brute-force on the driver
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select($"doc_id".cast("long"), octet_length($"text") % 5L + 1L)
      .as[(Long, Long)].collect()
    def polyHash(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) =>
        (a * 31L + (b & 0xff)) % TextQueries.HashP)
    val want = docs.map { case (id, w) =>
      val best = (1L to w).map { j =>
        val h = polyHash(s"$j:$id")
        h * TextQueries.WrsA % TextQueries.HashP *
          TextQueries.WrsA % TextQueries.HashP
      }.max
      (id, w, best)
    }.sortBy { case (id, _, best) => (-best, id) }.take(TextQueries.WrsN)
    assert(got.sortBy(r => (-r._3, r._1)).toSeq === want.toSeq)
    // weight-proportional selection: the sample over-represents heavy docs
    val meanAll = docs.map(_._2).sum.toDouble / docs.length
    val meanSample = got.map(_._2).sum.toDouble / got.length
    assert(meanSample > meanAll,
      s"sample mean weight $meanSample <= corpus mean $meanAll")
  }

  test("grouped top-k matches the window form with no Window in the plan") {
    import spark.implicits._
    val df = Queries.queries("w12_grouped_topk")(spark, TestSpark.sf)
    // the whole point: bounded-buffer aggregation, not a window sort
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window snuck into the plan:\n$plan")
    val got = df.as[(Long, Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_nationkey").orderBy($"bal".desc, $"c_custkey".asc)
    val want = Tables.load(spark, TestSpark.sf, "customer")
      .select($"c_nationkey".cast("long").as("c_nationkey"),
        round($"c_acctbal" * 100).cast("long").as("bal"),
        $"c_custkey".cast("long").as("c_custkey"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"c_nationkey", $"rk", $"c_custkey", $"bal")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("TopK buffer is bounded and merge-order invariant") {
    import graft.operators.TopK
    val agg = TopK.TopKAgg(3)
    val xs = (1L to 40L).map(i => TopK.Entry(i % 7, i))
    // fold in two different partition splits; same result, buffer <= k
    val (a, b) = xs.splitAt(13)
    val left = a.foldLeft(agg.zero)(agg.reduce)
    val right = b.foldLeft(agg.zero)(agg.reduce)
    assert(left.items.length <= 3 && right.items.length <= 3)
    val m1 = agg.merge(left, right)
    val m2 = agg.merge(
      xs.reverse.take(20).foldLeft(agg.zero)(agg.reduce),
      xs.reverse.drop(20).foldLeft(agg.zero)(agg.reduce))
    assert(m1.items === m2.items)
    assert(m1.items === xs.sortBy(e => (-e.v, e.id)).take(3))
  }
}
