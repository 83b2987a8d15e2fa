package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.NomismaMap

/** Nomisma mapper kernels (authorities/nomisma/mapper.py). */
class NomismaMapSpec extends AnyFunSuite {

  test("route: first recognized @type in record order wins") {
    assert(NomismaMap.route(Seq("nmo:Mint")) === Some("Place"))
    assert(NomismaMap.route(Seq("nmo:Region")) === Some("Place"))
    assert(NomismaMap.route(Seq("wordnet:Deity")) === Some("Person"))
    // Ethnic (Group) appears before Material (Type): Group wins
    assert(NomismaMap.route(Seq("nmo:Ethnic", "nmo:Material")) === Some("Group"))
    assert(NomismaMap.route(Seq("nmo:Material", "nmo:Ethnic")) === Some("Type"))
    // unknown entries are skipped, not fatal
    assert(NomismaMap.route(Seq("x:unknown", "foaf:Person")) === Some("Person"))
    assert(NomismaMap.route(Seq("x:unknown")) === None)
    assert(NomismaMap.route(Nil) === None)
  }

  test("nmRef: segment after the LAST nm:, non-nomisma passes WHOLE") {
    assert(NomismaMap.nmRef("nm:rome") === "rome")
    assert(NomismaMap.nmRef("prefix-nm:a-nm:b") === "b")
    // the reference's try/except guard never fires: split works on any
    // string, so a foreign URI survives intact and gets wrapped
    assert(NomismaMap.nmRef("http://vocab.getty.edu/aat/300") ===
      "http://vocab.getty.edu/aat/300")
    assert(NomismaMap.refUri("https://n.example/", "nm:rome") ===
      "https://n.example/rome.jsonld")
    assert(NomismaMap.refUri("https://n.example/", "http://x.org/v") ===
      "https://n.example/http://x.org/v.jsonld")
  }

  test("broader routes to part_of (Place) / broader (Type) only") {
    assert(NomismaMap.broaderProp("Place") === Some("part_of"))
    assert(NomismaMap.broaderProp("Type") === Some("broader"))
    assert(NomismaMap.broaderProp("Person") === None)
    assert(NomismaMap.broaderProp("Group") === None)
  }

  test("pointWkt: reference spacing, lon first; missing side drops") {
    assert(NomismaMap.pointWkt("41.9", "12.5") === Some("POINT ( 12.5 41.9 )"))
    assert(NomismaMap.pointWkt("", "12.5") === None)
    assert(NomismaMap.pointWkt("41.9", "") === None)
  }

  test("gYearSpan: only xsd:gYear parses; junk drops the event") {
    assert(NomismaMap.gYearSpan("xsd:gYear", "1987") ===
      Some(("1987-01-01T00:00:00", "1987-12-31T23:59:59", "1987")))
    assert(NomismaMap.gYearSpan("xsd:date", "1987") === None)
    assert(NomismaMap.gYearSpan("xsd:gYear", "junk") === None)
  }

  test("memberships: node indirection + direct, order kept, dupes kept") {
    val got = NomismaMap.memberships("https://n.example/",
      hasMembership = Seq("m1", "mMissing", "m2"),
      membershipOrg = Map("m1" -> "nm:orgA", "m2" -> "nm:orgB"),
      memberOf = Seq("nm:orgA")) // duplicate of the resolved one: kept
    assert(got === Seq("https://n.example/orgA.jsonld",
      "https://n.example/orgB.jsonld", "https://n.example/orgA.jsonld"))
  }

  test("homepage: only the first is accepted") {
    assert(NomismaMap.homepage(Seq("http://a", "http://b")) === Some("http://a"))
    assert(NomismaMap.homepage(Nil) === None)
  }
}
