package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.DnbMap

/** DNB/GND mapper kernels (libraries/dnb/mapper.py). */
class DnbMapSpec extends AnyFunSuite {

  test("guessType: both organization spellings, family/org subclassing") {
    assert(DnbMap.guessType("person") === Some(("Person", "")))
    assert(DnbMap.guessType("organization") === Some(("Group", "Organization")))
    assert(DnbMap.guessType("organisation") === Some(("Group", "Organization")))
    assert(DnbMap.guessType("family") === Some(("Group", "Family")))
    assert(DnbMap.guessType("place") === Some(("Place", "")))
    assert(DnbMap.guessType("event") === Some(("Event", "")))
    assert(DnbMap.guessType("work") === None)
  }

  test("guessLdsType: suffix match, first type in list order wins") {
    assert(DnbMap.guessLdsType(Seq("x#SubjectHeadingSensoStricto")) === Some("Type"))
    assert(DnbMap.guessLdsType(Seq("x#SubjectHeading")) === Some("Type"))
    assert(DnbMap.guessLdsType(Seq("x#Language")) === Some("Language"))
    assert(DnbMap.guessLdsType(Seq("x#EthnographicName")) === Some("Group"))
    assert(DnbMap.guessLdsType(
      Seq("x#Unknown", "x#NomenclatureInBiologyOrChemistry")) === Some("Type"))
    assert(DnbMap.guessLdsType(Seq("x#Unknown")) === None)
  }

  test("centuryComplete: two-digit death takes the birth century") {
    assert(DnbMap.centuryComplete("1871", "99") === "1899")
    assert(DnbMap.centuryComplete("1871", "1920") === "1920")
    assert(DnbMap.centuryComplete("", "99") === "99") // no birth: unchanged
    assert(DnbMap.centuryComplete("1871", "") === "")
  }

  test("activityRange: interior dash only, exactly one, both ends parse") {
    assert(DnbMap.activityRange("1800-1850") ===
      Some(("1800-01-01T00:00:00", "1850-12-31T23:59:59")))
    assert(DnbMap.activityRange("-500") === None) // leading minus: no gate
    assert(DnbMap.activityRange("1800-1850-1900") === None) // multi-dash
    assert(DnbMap.activityRange("1800") === None)
    assert(DnbMap.activityRange("1800-junk") === None) // end must parse
  }

  test("homepage self-link skip: record number among path segments") {
    assert(!DnbMap.keepHomepage("https://d-nb.info/gnd/118540238",
      "https://de.wikipedia.org/wiki/118540238"))
    assert(DnbMap.keepHomepage("https://d-nb.info/gnd/118540238",
      "https://example.org/goethe"))
    // substring inside a segment does NOT match (segment equality)
    assert(DnbMap.keepHomepage("https://d-nb.info/gnd/1185",
      "https://example.org/11850"))
  }

  test("depiction repair: spaces and %20 both become underscores") {
    assert(DnbMap.depictionUri("http://x/a b%20c.jpg") === "http://x/a_b_c.jpg")
  }

  test("gender: GND male/female only, others IGNORED (no passthrough)") {
    assert(DnbMap.gender("https://d-nb.info/standards/vocab/gnd/gender#male")
      === Some("male"))
    assert(DnbMap.gender("https://d-nb.info/standards/vocab/gnd/gender#female")
      === Some("female"))
    assert(DnbMap.gender("https://other/gender#nonbinary") === None)
  }

  test("macs.nt closeMatch line parse") {
    assert(DnbMap.macsLine("<https://d-nb.info/gnd/4129090-2> " +
      "<http://www.w3.org/2004/02/skos/core#closeMatch> " +
      "<http://id.loc.gov/authorities/subjects/sh85000691> .") ===
      Some(("4129090-2", "http://id.loc.gov/authorities/subjects/sh85000691")))
    assert(DnbMap.macsLine("<https://other/x> <p> <o> .") === None)
    assert(DnbMap.macsLine("<https://d-nb.info/gnd/1-2> <p> <o> <extra> .")
      === None) // must be exactly a triple
  }

  test("lds election + broader gate + string-only preferredName") {
    assert(DnbMap.ldsElect(Seq("https://x/1/about", "https://x/1", "y")) ===
      Some("https://x/1"))
    assert(DnbMap.ldsElect(Seq("https://x/1/about")) === None)
    assert(DnbMap.takesBroader("Type") && DnbMap.takesBroader("Language"))
    assert(!DnbMap.takesBroader("Group") && !DnbMap.takesBroader(""))
    assert(DnbMap.preferredName(Right("N")) === Some("N"))
    assert(DnbMap.preferredName(Left(Seq("a", "b"))) === None)
  }
}
