package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The curation/ops battery: semantics and plan-shape pins beyond the
  * DuckDB oracle rows. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("c1: a set of self+token only is always killed, trusted hit keeps") {
    import spark.implicits._
    val rows = CurationQueries.pcshStrip(spark, sf)
      .select($"id", $"n_equiv", $"n_trusted", $"verdict").collect()
    rows.foreach { r =>
      val (n, trusted, verdict) = (r.getLong(1), r.getLong(2), r.getString(3))
      // the reference's guard: len(equivs) <= 2 never counts a vocab hit
      if (n <= 2) assert(verdict == "killed")
      assert((trusted > 0) == (verdict == "kept"))
    }
    // both branches occur
    assert(rows.exists(_.getString(3) == "kept"))
    assert(rows.exists(_.getString(3) == "killed"))
  }

  test("c2: deleted edges vanish, the rest survive; curated side broadcasts") {
    import spark.implicits._
    val df = CurationQueries.placeEdgePrune(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"curated deletions not broadcast:\n$p")
    assert(p.contains("LeftAnti"), s"not an anti join:\n$p")
    // a child named by a deletion keeps exactly one parent, others keep two
    val counts = df.groupBy($"child_id").count()
    assert(counts.filter($"count" === 1).count() > 0)
    assert(counts.filter($"count" === 2).count() > 0)
    assert(counts.filter($"count" > 2 || $"count" < 1).count() === 0)
  }

  test("c3: note extraction is last-match-wins like the reference loop") {
    import spark.implicits._
    // two MATERIAL notes: the later one must win (extract_materials.py
    // overwrites material_desc on every matching note)
    val m = "http://vocab.getty.edu/aat/300435429"
    val df = Seq((1L, Seq((m, "first"), (m, "second")))).toDF("id", "raw")
      .select($"id", transform($"raw", n =>
        struct(n.getField("_1").as("cxn"), n.getField("_2").as("content")))
        .as("notes"))
      .select(aggregate($"notes", lit(""), (acc, n) =>
        when(n.getField("cxn") === m, n.getField("content")).otherwise(acc))
        .as("mat"))
    assert(df.head().getString(0) == "second")
  }

  test("c6: audit covers every verdict arm and the failed cache nulls out") {
    import spark.implicits._
    val rows = CurationQueries.freshnessAudit(spark, sf).collect()
    assert(rows.length == 10)
    val byVerdict = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(byVerdict.contains("failed"))
    assert(byVerdict("failed") == 1)
    val failed = rows.find(_.getString(3) == "failed").get
    assert(failed.isNullAt(1) && failed.isNullAt(2) && failed.isNullAt(4))
    // every non-failed row: diff is the absolute gap, verdict matches sign
    rows.filter(_.getString(3) != "failed").foreach { r =>
      val (local, remote, diff) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(diff == math.abs(remote - local))
      r.getString(3) match {
        case "needs_update"  => assert(remote > local)
        case "no_difference" => assert(remote == local)
        case "local_newer"   => assert(local > remote)
      }
    }
  }

  test("c7: big idmap side is never shuffled (two-step broadcast)") {
    val df = CurationQueries.curatedAudit(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"idmap side shuffled:\n$p")
    // all three classifications occur
    val verdicts = df.select("status").distinct().collect().map(_.getString(0)).toSet
    assert(verdicts == Set("missing", "changed", "ok"))
  }

  test("k-anonymity audit: suppressed groups are exactly those under k") {
    import spark.implicits._
    val rows = TextQueries.kanonAudit(spark, sf)
      .select($"n_docs", $"status").collect()
    rows.foreach { r =>
      assert((r.getLong(0) < 5L) == (r.getString(1) == "suppress"))
    }
    // the quasi-identifier grid at this sf produces both outcomes
    assert(rows.exists(_.getString(1) == "suppress"))
    assert(rows.exists(_.getString(1) == "ok"))
  }

  test("er pipeline: possible-band typos and cross-entity name collisions never cluster") {
    import spark.implicits._
    val out = OpsQueries.erPipeline(spark, sf)
      .select($"rid", $"cluster_id", $"n_members").as[(Long, Long, Long)]
      .collect()
    out.foreach { case (rid, cid, n) =>
      val ck = rid / 2
      val matched = ck % 3 != 0 && ck % 5 != 0 && rid % 2 == 0 ||
        (rid % 2 == 1 && ck % 5 != 0) // B exists only when ck % 3 != 0
      if (matched) {
        // true pair clusters under the A-record id with exactly 2 members
        assert(cid == ck * 2 && n == 2L, s"rid=$rid cid=$cid n=$n")
      } else {
        // street-typo (possible band) and unpaired records stay singletons
        assert(cid == rid && n == 1L, s"rid=$rid cid=$cid n=$n")
      }
    }
    assert(out.count(_._3 == 2L) > 0)
    assert(out.count(_._3 == 1L) > 0)
  }

  test("attribution: touch order and channel domain hold on every credited row") {
    import spark.implicits._
    val rows = RelationalQueries.attribution(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(6)
      if (n > 0) {
        // event ids are assigned in ts order, so first <= last
        assert(r.getLong(2) <= r.getLong(4))
        assert(Set("view", "click")(r.getString(3)))
        assert(Set("view", "click")(r.getString(5)))
      } else {
        assert(r.isNullAt(2) && r.isNullAt(4), s"phantom touch: $r")
      }
    }
  }

  test("c8: malformed json is bad, empty pages map is deleted, valid kept") {
    import spark.implicits._
    val rows = CurationQueries.cacheSweep(spark, sf)
      .groupBy($"verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("bad", "deleted", "kept"))
    // variants 2 and 3 are bad; 1 and 4 deleted; 0 kept — bad+deleted = 4/5
    assert(rows("bad") + rows("deleted") > rows("kept"))
  }
}
