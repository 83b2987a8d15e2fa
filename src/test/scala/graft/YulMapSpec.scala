package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.YulMap

/** M1k: the Yale Library mapper exemplar (`yale/library/mapper.py`). */
class YulMapSpec extends AnyFunSuite {

  private val known = Set("France", "England", "Germany", "Sweden")

  test("parens parents: comma prefers the right side (country)") {
    assert(YulMap.parensParent("Abbey (Paris, France)", known)
      === Some("France"))
    // but a comma form that IS a known key wins whole
    assert(YulMap.parensParent("Abbey (Paris, France)", Set("Paris, France"))
      === Some("Paris, France"))
  }

  test("parens parents: colon-qualified forms test both sides in order") {
    assert(YulMap.parensParent("P (Norfolk, England : Parish)", known)
      === Some("England"))
    assert(YulMap.parensParent("K (Sweden : Kommun)", known) === Some("Sweden"))
    assert(YulMap.parensParent("V (Paris : France)", known) === Some("France"))
  }

  test("parens parents: ' and '-joined pair picks the first known side") {
    assert(YulMap.parensParent("X (Bavaria and Germany)", known)
      === Some("Germany"))
    assert(YulMap.parensParent("X (France and Germany)", known)
      === Some("France"))
  }

  test("parens parents: no parens or no known candidate resolve nothing") {
    assert(YulMap.parensParent("Z Paris", known) === None)
    assert(YulMap.parensParent("Y (Nowhere, Unknownland)", known) === None)
    assert(YulMap.parensParent("W (France)", known) === Some("France"))
  }

  test("walk_multi: single props collapse to their first element") {
    assert(YulMap.normalize("timespan", Seq("a", "b")) === Seq("a"))
    assert(YulMap.normalize("about", Seq("a", "b")) === Seq("a", "b"))
    assert(YulMap.normalize("other", Seq("a", "b")) === Seq("a", "b"))
  }

  test("marcgt and sort-title swaps (https matched, http emitted)") {
    assert(YulMap.marcgtSwap("http://id.loc.gov/vocabulary/marcgt/rea")
      === "http://vocab.getty.edu/aat/300265419")
    assert(YulMap.marcgtSwap("http://id.loc.gov/vocabulary/marcgt/pic")
      === "http://vocab.getty.edu/aat/300264388")
    assert(YulMap.marcgtSwap("x") === "x")
    assert(YulMap.sortTitleSwap("https://vocab.getty.edu/aat/300451544")
      === "http://vocab.getty.edu/aat/300456575")
    // the http form does NOT match (reference matches https only)
    assert(YulMap.sortTitleSwap("http://vocab.getty.edu/aat/300451544")
      === "http://vocab.getty.edu/aat/300451544")
  }
}
