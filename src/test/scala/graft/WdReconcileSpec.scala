package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.WdReconcile.decide

/** J3 decision-tree fixtures (wikidata/reconciler.py:57-137) — the paths
  * and orderings the modular j3 fixture can't discriminate. */
class WdReconcileSpec extends AnyFunSuite {

  test("unanimity and the truth veto") {
    assert(decide(Seq("aat:1" -> "Q5", "lcnaf:2" -> "Q5"), None).contains("Q5"))
    assert(decide(Seq("aat:1" -> "Q5"), Some("Q5")).contains("Q5"))
    assert(decide(Seq("aat:1" -> "Q5"), Some("Q9")).isEmpty)
    assert(decide(Nil, Some("Q5")).isEmpty) // truth alone is no vote
  }

  test("any truth on a multi-way split defers to manual review") {
    // even when the truth agrees with the would-be winner (:106-109)
    val votes = Seq("aat:1" -> "Q5", "lcnaf:2" -> "Q5", "ulan:3" -> "Q9")
    assert(decide(votes, None).contains("Q5")) // rule 1 would pick it
    assert(decide(votes, Some("Q5")).isEmpty)  // but truth defers
    assert(decide(votes, Some("Q7")).isEmpty)
  }

  test("rule 1 needs exactly one qid with a repeated vote") {
    // 2+2 split: two qids both have >=2 votes -> ambiguous at rule 1,
    // and with no viaf/geonames to strip, counts 2:2 fail the 2:1 bar
    assert(decide(Seq("aat:1" -> "Q5", "lcnaf:2" -> "Q5",
      "ulan:3" -> "Q9", "tgn:4" -> "Q9"), None).isEmpty)
  }

  test("rule 1 precedes the strip: noisy sources CAN win a 2-way repeat") {
    // ivtd has 2 qids and only Q9 repeats — rule 1 picks it even though
    // both Q9 votes are noisy sources (:115-119 runs before :120-123)
    assert(decide(Seq("aat:1" -> "Q5", "viaf:2" -> "Q9",
      "geonames:3" -> "Q9"), None).contains("Q9"))
  }

  test("the strip rescues a three-way tie no majority could") {
    // 1:1:1 over three qids — rule 1 needs two qids, majority needs 2:1;
    // stripping viaf/geonames leaves only Q5 (:120-123)
    assert(decide(Seq("aat:1" -> "Q5", "viaf:2" -> "Q9",
      "geonames:3" -> "Q7"), None).contains("Q5"))
  }

  test("2:1 majority needs at least double the runner-up") {
    // Q5:2, Q9:1, Q7:1 — three-way, 2 >= 2*1 → majority picks Q5
    val base = Seq("aat:1" -> "Q5", "ulan:2" -> "Q5", "lcnaf:3" -> "Q9",
      "tgn:4" -> "Q7")
    assert(decide(base, None).contains("Q5"))
    // Q5:2, Q9:2, Q7:1 — 2 >= 2*2 fails → None
    assert(decide(base :+ ("japan:5" -> "Q9"), None).isEmpty)
  }

  test("two lone votes resolve only by stripping a noisy source") {
    assert(decide(Seq("aat:1" -> "Q5", "viaf:2" -> "Q9"), None).contains("Q5"))
    assert(decide(Seq("aat:1" -> "Q5", "lcnaf:2" -> "Q9"), None).isEmpty)
    // both noisy: nothing survives the strip
    assert(decide(Seq("viaf:1" -> "Q5", "geonames:2" -> "Q9"), None).isEmpty)
  }

  test("duplicate keys collapse like dict entries") {
    // the same prefixed identifier can only vote once
    assert(decide(Seq("aat:1" -> "Q5", "aat:1" -> "Q5"), None).contains("Q5"))
  }
}
