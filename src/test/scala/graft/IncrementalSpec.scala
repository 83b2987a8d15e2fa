package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Incremental-rebuild scenario (SURVEY §2.10 / reference
  * test_updates.py): apply a changeset (creates/updates/deletes) to a
  * snapshot, recompute ONLY affected keys, and assert the result equals
  * a full recompute. */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("affected-only recompute equals full recompute after a changeset") {
    import spark.implicits._
    val ev = Tables.load(spark, TestSpark.sf, "events")
      .select($"user_id", $"event_id", $"event_type", $"value")
    val cutoffId = 800L
    val snapshotEvents = ev.filter($"event_id" < cutoffId)
    // the standing aggregate over the snapshot
    def aggOf(e: org.apache.spark.sql.DataFrame) =
      e.groupBy($"user_id").agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("long")).as("cents"))
    val standing = aggOf(snapshotEvents)
    // changeset: creates/updates = events >= cutoff; deletes = every
    // event_id divisible by 97 (tombstones)
    val incoming = ev.filter($"event_id" >= cutoffId)
    val deletes = ev.filter($"event_id" % 97 === 0).select($"event_id")
    val newEvents = snapshotEvents.union(incoming)
      .join(deletes, Seq("event_id"), "left_anti")
    // affected keys: users touched by incoming or deletes
    val affected = incoming.select($"user_id")
      .union(ev.join(deletes, Seq("event_id"), "left_semi").select($"user_id"))
      .distinct()
    // incremental: keep standing rows for untouched users, recompute
    // affected users from the new event set
    val untouched = standing.join(affected, Seq("user_id"), "left_anti")
    val recomputed = aggOf(newEvents.join(affected, Seq("user_id"), "left_semi"))
    val incremental = untouched.union(recomputed)
    val full = aggOf(newEvents)
    assert(incremental.except(full).count() === 0)
    assert(full.except(incremental).count() === 0)
  }

  test("scd2 history: contiguous intervals, one open version per user") {
    import spark.implicits._
    val rows = Queries.queries("u2_scd2_history")(spark, TestSpark.sf)
      .select($"user_id", $"event_type", $"valid_from", $"valid_to",
        $"is_current")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val hist = vs.sortBy(_._3)
      // exactly one open-ended current version, and it is the last one
      assert(hist.count(_._5 == 1L) === 1, s"user $user current count")
      assert(hist.last._5 === 1L && hist.last._4 === Long.MaxValue)
      // intervals tile the timeline: each valid_to is the next valid_from
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 === b._3, s"gap/overlap for user $user")
          assert(a._2 !== b._2, s"uncollapsed repeat for user $user")
        case _ =>
      }
    }
  }
}
