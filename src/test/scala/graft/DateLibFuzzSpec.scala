package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DateLib

/** Totality fuzz for the date library — the corrupt-input battery's
  * scalar sibling (f1b_date_diff pins the SEMANTICS differentially;
  * this pins that no input, however mangled, can throw out of the
  * parse, and that every produced interval is well-formed: both ends
  * re-read as BCE-safe epoch seconds with begin ≤ end). Seeded, so
  * failures reproduce (the KernelPropertySpec convention). */
class DateLibFuzzSpec extends AnyFunSuite {

  // date-ish fragments reach deep branches far more often than uniform
  // noise; raw unicode noise runs alongside
  private val fragments = Vector(
    "19", "94", "7", "0000", "9999", "-", ".", " ", "/", ":", "T", "Z",
    "X", "?", "~", "=", "+", "(c)", ")", "BC", "B.C.E.", "BCE", "v",
    "st", "nd", "th", "century", "early", "late", "Jh", "edtf", "May",
    "Sep", "September", "5784", "00", "x")

  private def dateish(rnd: scala.util.Random): String =
    Seq.fill(rnd.nextInt(12))(fragments(rnd.nextInt(fragments.size))).mkString

  private def noise(rnd: scala.util.Random): String =
    Seq.fill(rnd.nextInt(24))(
      (rnd.nextInt(0x2fff) + 1).toChar).mkString

  private def inputs(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(if (rnd.nextBoolean()) dateish(rnd) else noise(rnd))
  }

  // " century - " phrases can legitimately produce an INVERTED interval
  // ("5th century - 2nd century"): the reference builds "400 - 199"
  // without a guard (process/base/mapper.py:235-241) and we mirror it —
  // garbage-in-garbage-out, pinned below; skipped in the ordering law
  private def isInvertedCenturyRange(s: String): Boolean =
    "(?is).*century\\s*-.*century.*".r.matches(s.trim)

  test("makeDatetime is total and every interval is well-formed") {
    for (s <- inputs(seed = 14L, n = 4000)) {
      val r = DateLib.makeDatetime(s) // must never throw
      r.foreach { dr =>
        val b = DateLib.epochSeconds(dr.begin)
        val e = DateLib.epochSeconds(dr.end)
        assert(b.isDefined && e.isDefined,
          s"unreadable interval for ${s.take(40)} -> $dr")
        if (!isInvertedCenturyRange(s))
          assert(b.get <= e.get, s"begin > end for ${s.take(40)} -> $dr")
      }
    }
  }

  test("inverted century range mirrors the reference (unguarded, documented)") {
    val r = DateLib.makeDatetime("5th century - 2nd century").get
    assert(r.begin.startsWith("0400-") && r.end.startsWith("0199-"))
  }

  test("makeDatetimeWikidata is total over noise times and precisions") {
    val rnd = new scala.util.Random(15L)
    for (s <- inputs(seed = 16L, n = 3000)) {
      DateLib.makeDatetimeWikidata(s, rnd.nextInt(17) - 1) // must never throw
    }
  }

  test("epochSeconds is total") {
    for (s <- inputs(seed = 17L, n = 3000)) {
      DateLib.epochSeconds(s) // must never throw
    }
  }
}
