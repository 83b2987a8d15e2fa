package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Sanitize, UriCanon, WordFold}

/** Totality fuzz for the string kernels — the DateLibFuzzSpec class
  * applied to the sanitize / canonicalize / fold family (their
  * SEMANTICS are pinned differentially by f18b / f8b / lux_q14; this
  * pins that no input, however mangled — unpaired surrogates included —
  * can throw, and the cheap algebraic laws: idempotence where the
  * kernel promises it, and the padding floor). Seeded, so failures
  * reproduce. */
class TextKernelFuzzSpec extends AnyFunSuite {

  // uri-ish and text-ish fragments reach deep branches more often than
  // uniform noise; raw unicode noise (including lone surrogates and
  // supplementary-plane chars) runs alongside
  private val fragments = Vector(
    "http://", "https://", "vocab.getty.edu/aat/", "page/aat", "aat/page",
    "viaf.org/viaf/", "wikidata.org/entity/", ".html", "/", "\"", "”",
    " ", " ", "　", "-", "\\", "\r", "\n", "\t", "{", "}", "%",
    "é", "é", "xा", "x⃣", "𝕓", "İ", "ß", "þ", "!", ".", "'", "a",
    "Q42", "300")

  private def uriish(rnd: scala.util.Random): String =
    Seq.fill(rnd.nextInt(10))(fragments(rnd.nextInt(fragments.size))).mkString

  private def noise(rnd: scala.util.Random): String =
    Seq.fill(rnd.nextInt(24))(
      (rnd.nextInt(0xfffe) + 1).toChar).mkString // lone surrogates included

  private def inputs(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(if (rnd.nextBoolean()) uriish(rnd) else noise(rnd))
  }

  test("sanitizeString is total; padded words never undershoot") {
    for (s <- inputs(seed = 18L, n = 4000)) {
      Sanitize.sanitizeString(s) // must never throw
      val padded = Sanitize.sanitizeString(s,
        removeDiacritics = true, minWordChars = 3)
      for (w <- padded.split(" ") if w.nonEmpty)
        assert(w.codePointCount(0, w.length) >= 3,
          s"short word '$w' for input ${s.take(30)}")
    }
  }

  test("sanitizeUri is total and idempotent") {
    for (s <- inputs(seed = 19L, n = 4000)) {
      val once = Sanitize.sanitizeUri(s)
      assert(Sanitize.sanitizeUri(once) === once,
        s"not idempotent for ${s.take(30)}")
    }
  }

  test("canonicalizeJvm is total and converges under re-application") {
    // Strict idempotence is UriCanonSpec's law on the CURATED variant
    // space. On adversarial garbage the reference itself is not
    // idempotent, and this fuzz found the shapes (engine verified
    // behavior-identical to config.py in each): an identifier like
    // " https://junk" dodges the double-wrap recursion (startswith
    // runs BEFORE fix_identifier, :214-220) and the space scrub MINTS
    // an inner wrapper the second pass trashes; a trailing quote
    // blocks the strip and its removal RE-EXPOSES edge whitespace
    // (strip-then-replace order, :172-186); "a//" loses one slash per
    // pass. The honest law for garbage-in: total, and the rewrite
    // chain canon, canon², … reaches a fixed point (or null) within a
    // few steps — no oscillation, no unbounded drift.
    for (s <- inputs(seed = 20L, n = 4000)) {
      var cur = UriCanon.canonicalizeJvm(s) // must never throw
      var steps = 0
      var converged = cur == null
      while (!converged && steps < 5) {
        val next = UriCanon.canonicalizeJvm(cur)
        if (next == null || next == cur) converged = true
        else { cur = next; steps += 1 }
      }
      assert(converged, s"no convergence within 5 for ${s.take(30)}")
    }
  }

  test("pyStrip is total, idempotent, and a substring of its input") {
    for (s <- inputs(seed = 21L, n = 4000)) {
      val t = UriCanon.pyStrip(s)
      assert(UriCanon.pyStrip(t) === t)
      assert(s.contains(t), s"not a substring for ${s.take(30)}")
    }
  }

  test("WordFold.fold is total and idempotent") {
    for (s <- inputs(seed = 22L, n = 4000)) {
      val once = WordFold.fold(s) // must never throw on lone surrogates
      assert(WordFold.fold(once) === once,
        s"not idempotent for ${s.take(30)}")
    }
  }
}
