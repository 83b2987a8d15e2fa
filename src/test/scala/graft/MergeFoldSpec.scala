package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RecordMerge
import graft.operators.RecordMerge.{Buf, Rec}

class MergeFoldSpec extends AnyFunSuite {
  private val recs = Seq(
    Rec(1L, 30L, 300L, "F", "3-MEDIUM", 100L),
    Rec(1L, 10L, 100L, "O", "1-URGENT", 250L),
    Rec(1L, 20L, 100L, "P", "2-HIGH", 50L)) // ties on epochMs -> orderKey wins

  private def fold(rs: Seq[Rec]): RecordMerge.Merged = {
    val a = RecordMerge.merger
    a.finish(rs.foldLeft(a.zero)(a.reduce))
  }

  test("first-by-merge-order wins scalars; sets union; sums accumulate") {
    val m = fold(recs)
    assert(m.firstOrderkey === 10L)
    assert(m.baseStatus === "O")
    assert(m.basePriority === "1-URGENT")
    assert(m.statuses === "F,O,P")
    assert(m.nMerged === 3L)
    assert(m.totalCents === 400L)
  }

  test("fold is order-insensitive (associative + commutative)") {
    val perms = recs.permutations.toSeq
    val results = perms.map(fold)
    assert(results.distinct.size === 1)
    // and merge() of partial buffers agrees with any sequential fold
    val a = RecordMerge.merger
    val split: Seq[(Seq[Rec], Seq[Rec])] = Seq(
      (recs.take(1), recs.drop(1)), (recs.take(2), recs.drop(2)))
    split.foreach { case (l, r) =>
      val lb = l.foldLeft(a.zero)(a.reduce)
      val rb = r.foldLeft(a.zero)(a.reduce)
      assert(a.finish(a.merge(lb, rb)) === results.head)
      assert(a.finish(a.merge(rb, lb)) === results.head)
    }
  }

  test("zero buffer merges as identity") {
    val a = RecordMerge.merger
    val b = recs.foldLeft(a.zero)(a.reduce)
    assert(a.finish(a.merge(b, a.zero)) === a.finish(b))
    assert(a.finish(a.merge(a.zero, b)) === a.finish(b))
  }
}
