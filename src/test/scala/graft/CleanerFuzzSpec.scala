package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cleaner, LaMerge}
import graft.operators.LaMerge.{LaName, LaRecord}

/** Totality + law fuzz for the name election — the DateLibFuzzSpec /
  * TextKernelFuzzSpec class applied to `Cleaner.electNames` (its
  * SEMANTICS are pinned differentially by w2b's 20 arms; this pins
  * that no random name list — empty contents, null contents, repeated
  * flags, multi-language names, mixed Identifiers — can throw, plus
  * the algebraic laws the mutation-heavy index code must preserve).
  * Seeded, so failures reproduce. */
class CleanerFuzzSpec extends AnyFunSuite {

  private val flagPool = Vector(
    LaMerge.primaryNameId, LaMerge.alternateNameId, LaMerge.sortNameId,
    Cleaner.officialNameId, Cleaner.alternateTitleId,
    Cleaner.translatedTitleId, "urn:x", "urn:y")
  private val langPool = Vector("en", "es", "fr", "de", "nl", "zh", "xx", "yy")
  private val contentPool = Vector(
    "", " ", "  ", null, "a", "ab", "NM", "GB", "ABC9", "Great Britain",
    "déjà vu", "ＮＭ", "x" * 40, "Mixed Case Name", "word")
  private val typePool = Vector("Person", "Group", "Place", "Type",
    "HumanMadeObject", "DigitalObject")

  private def genRecord(rnd: scala.util.Random): LaRecord = {
    val names = Seq.fill(rnd.nextInt(7)) {
      val ntype = if (rnd.nextInt(5) == 0) "Identifier" else "Name"
      LaName(ntype,
        contentPool(rnd.nextInt(contentPool.size)),
        Seq.fill(rnd.nextInt(4))(flagPool(rnd.nextInt(flagPool.size))),
        Seq.fill(rnd.nextInt(3))(langPool(rnd.nextInt(langPool.size))))
    }
    LaRecord(s"r${rnd.nextInt(1000)}", typePool(rnd.nextInt(typePool.size)),
      if (rnd.nextBoolean()) s"label${rnd.nextInt(9)}" else null, "src")
      .copy(identifiedBy = names)
  }

  test("electNames is total and deterministic over 4000 random records") {
    val rnd = new scala.util.Random(42L)
    for (_ <- 1 to 4000) {
      val rec = genRecord(rnd)
      val a = Cleaner.electNames(rec) // must never throw
      val b = Cleaner.electNames(rec)
      assert(a == b, s"non-deterministic on $rec")
    }
  }

  test("output names come from the input (or the documented fallbacks)") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 2000) {
      val rec = genRecord(rnd)
      Cleaner.electNames(rec).foreach { out =>
        val inContents = rec.identifiedBy.map(_.content).toSet
        val allowed = inContents + rec.label + s"Unnamed ${rec.rtype}"
        for (n <- out)
          assert(allowed.contains(n.content),
            s"invented content '${n.content}' on $rec")
        // election only rewrites flags; it never drops a non-Name entry
        // or a Name with non-blank content, and never duplicates rows
        val kept = rec.identifiedBy.filter(n => n.ntype != "Name" ||
          Option(n.content).exists(_.trim.nonEmpty))
        val want = if (kept.isEmpty) 1 else kept.size // fallback injects one
        assert(out.size == want,
          s"size drift: in=${kept.size} out=${out.size} on $rec")
      }
    }
  }

  test("at most one sort-name holder when no input repeats the flag") {
    val rnd = new scala.util.Random(99L)
    var checked = 0
    for (_ <- 1 to 4000) {
      val rec0 = genRecord(rnd)
      // dedupe flags per name so the ≤1-holder law is well-posed
      val rec = rec0.copy(identifiedBy = rec0.identifiedBy.map(n =>
        n.copy(classifiedAs = n.classifiedAs.distinct)))
      Cleaner.electNames(rec).foreach { out =>
        val holders = out.count(n =>
          n.ntype == "Name" && n.classifiedAs.contains(LaMerge.sortNameId))
        assert(holders <= 1, s"$holders sort-name holders on $rec")
        checked += 1
      }
    }
    assert(checked > 3000) // the law actually ran
  }

  test("display order is score-sorted (stable) for the emitted list") {
    val rnd = new scala.util.Random(1234L)
    def score(n: LaName): Int = {
      if (n.ntype == "Identifier") 0
      else {
        val m = Map("en" -> 100, "es" -> 90, "fr" -> 80, "de" -> 70,
          "nl" -> 60, "zh" -> 50)
        val t = n.languages.flatMap(m.get).maxOption
          .getOrElse(if (n.languages.nonEmpty) 10 else 0)
        t + (if (n.classifiedAs.contains(LaMerge.primaryNameId)) 5
             else if (n.classifiedAs.contains(LaMerge.alternateNameId)) 1
             else 0)
      }
    }
    for (_ <- 1 to 2000) {
      val rec = genRecord(rnd)
      Cleaner.electNames(rec).foreach { out =>
        val scores = out.map(score)
        assert(scores == scores.sortBy(-(_: Int)),
          s"display order not score-descending: $scores on $rec")
      }
    }
  }
}
