package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.GeonamesMap

/** GeoNames mapper kernels (general/geonames/mapper.py). */
class GeonamesMapSpec extends AnyFunSuite {

  test("Place-only gate and JSON passthrough") {
    assert(GeonamesMap.mapsType("Place"))
    assert(!GeonamesMap.mapsType("Person"))
    assert(GeonamesMap.passthroughOk(hasId = true, dtype = "Place"))
    assert(!GeonamesMap.passthroughOk(hasId = false, dtype = "Place"))
    assert(!GeonamesMap.passthroughOk(hasId = true, dtype = "Group"))
  }

  test("identifier strips exactly one trailing slash") {
    assert(GeonamesMap.fixIdentifier("https://sws.geonames.org/42/") ===
      "https://sws.geonames.org/42")
    assert(GeonamesMap.fixIdentifier("https://sws.geonames.org/42") ===
      "https://sws.geonames.org/42")
  }

  test("language gate: untagged passes, unprocessed langs drop the name") {
    val p = GeonamesMap.foldOfficial(Seq(
      ("fr", "Ville"), ("tlh", "Klingon"), ("", "Plain")))
    assert(p === Seq(("fr", "Ville"), ("", "Plain")))
    val a = GeonamesMap.foldAlternate(Seq(
      ("de", "A1"), ("xx", "Gated"), ("de", "A2")))
    assert(a === Seq(("de", Seq("A1", "A2"))))
  }

  test("officialName same-lang entries overwrite (dict assignment)") {
    val p = GeonamesMap.foldOfficial(Seq(("en", "Town"), ("en", "TownBis")))
    assert(p === Seq(("en", "TownBis")))
  }

  test("label election precedence chain") {
    val pn = Seq(("fr", "Ville"), ("en", "Town"), ("", "Plain"))
    val an = Seq(("en", Seq("Alt")), ("de", Seq("Alt2")))
    assert(GeonamesMap.electName(Some("City"), pn, an) === Some("City"))
    assert(GeonamesMap.electName(None, pn, an) === Some("Town"))
    assert(GeonamesMap.electName(None, pn.filterNot(_._1 == "en"), an) ===
      Some("Alt")) // en alternate beats untagged official
    assert(GeonamesMap.electName(None, pn.filterNot(_._1 == "en"),
      an.tail) === Some("Plain"))
    assert(GeonamesMap.electName(None, Seq(("fr", "Ville")), an.tail) ===
      Some("Ville")) // first official
    assert(GeonamesMap.electName(None, Nil, an.tail) === Some("Alt2"))
    assert(GeonamesMap.electName(None, Nil, Nil) === None)
  }

  test("POINT rendering: lng first, spaces inside both parens") {
    assert(GeonamesMap.pointWkt("48.5", "9.25") === "POINT ( 9.25 48.5 )")
  }

  test("parentFeature suppresses parentCountry entirely") {
    assert(GeonamesMap.parents(Seq("pf1", "pf2"), Seq("pc1")) ===
      Seq("pf1", "pf2"))
    assert(GeonamesMap.parents(Nil, Seq("pc1")) === Seq("pc1"))
  }
}
