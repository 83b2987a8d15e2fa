package graft

import java.util.Locale

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DateLib
import graft.plans.LuxCompiler
import graft.sources.AsStream

/** The Turkish-locale seal (round-13 hardening, round-14 verdict item 5):
  * every no-arg `String.toLowerCase`/`toUpperCase` in src/main was pinned
  * to Locale.ROOT because the default-locale forms break on a
  * Turkish-locale JVM — tr casing maps capital I to DOTLESS ı ('APRIL' →
  * 'aprıl'), which silently misses month-name lookups, term-fold
  * derivations, and change-type normalization. The sandbox runs a
  * C-locale JVM, so without this spec a regression to the no-arg form is
  * invisible: these tests compute each result under the ambient locale,
  * flip the JVM default to tr-TR (restored in finally), and assert the
  * SAME result — flipping any one of the pinned calls back to no-arg
  * toLowerCase fails the corresponding assertion.
  *
  * All three paths are pure driver-side calls (no SparkSession), so the
  * tr-TR window is milliseconds and cannot interleave with a Spark job's
  * own casing. Each input deliberately carries a capital I — the only
  * letter whose tr mapping diverges. */
class TurkishLocaleSpec extends AnyFunSuite {

  private def underTurkishLocale[A](body: => A): A = {
    val saved = Locale.getDefault
    Locale.setDefault(new Locale("tr", "TR"))
    try body finally Locale.setDefault(saved)
  }

  // sanity: the JVM actually applies the tr mapping we are sealing against
  test("tr-TR default locale maps I to dotless ı (the hazard is real)") {
    underTurkishLocale {
      assert("APRIL".toLowerCase === "aprıl")
      assert("APRIL".toLowerCase(Locale.ROOT) === "april")
    }
  }

  test("DateLib month-name lookups are locale-independent") {
    // APRIL and 19 SEPTEMBER 2002 both carry a capital I: a no-arg
    // toLowerCase in the monthNames lookup would miss the map under tr
    // and the parse would fall through to None / a different range
    val inputs = Seq("APRIL 2002", "19 SEPTEMBER 2002", "JUNE 14, 1800")
    val expected = inputs.map(DateLib.makeDatetime(_))
    expected.foreach(e => assert(e.isDefined, "fixture must parse"))
    underTurkishLocale {
      val got = inputs.map(DateLib.makeDatetime(_))
      assert(got === expected,
        "month-name parse diverged under tr-TR default locale")
    }
  }

  test("LuxCompiler term folds are locale-independent") {
    // INDEX/İstanbul: the term-side lowercase feeds WordFold; under a
    // no-arg toLowerCase tr turns INDEX into ındex, which no longer
    // matches the locale-independent fold Spark's lower() applies to
    // the indexed tokens
    val terms = Seq("INDEX", "TITLE", "NAIVE-BAYES", "FIX*")
    val expected = terms.map(LuxCompiler.foldedWords)
    underTurkishLocale {
      assert(terms.map(LuxCompiler.foldedWords) === expected,
        "foldedWords diverged under tr-TR default locale")
      assert(LuxCompiler.foldedWords("INDEX") === Seq("index"))
    }
  }

  test("AS change-type normalization is locale-independent") {
    // SPLIT carries the capital I: a no-arg toLowerCase yields "splıt",
    // which is not in changeTypes and silently degrades to "update"
    val src = new AsStream.PageSource {
      def lastPage: Option[String] = Some("0")
      def page(id: String): (Seq[AsStream.AsItem], Option[String]) =
        (Seq(AsStream.AsItem("SPLIT", "http://ex.org/data/r1", "E900")), None)
    }
    def classify(): Seq[String] =
      AsStream.crawl(src, "http://ex.org/data/", "E100").map(_.change)
    assert(classify() === Seq("split"))
    underTurkishLocale {
      assert(classify() === Seq("split"),
        "change-type normalization diverged under tr-TR default locale")
    }
  }
}
