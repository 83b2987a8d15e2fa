package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.LongTail

/** M1m: the long-tail per-source mapper quirks. */
class LongTailSpec extends AnyFunSuite {

  test("pleiades geojson: polygon keeps only the exterior ring") {
    val ext = Seq(("0", "0"), ("2", "0"), ("2", "2"), ("0", "0"))
    val hole = Seq(("1", "1"), ("1.5", "1"), ("1", "1"))
    assert(LongTail.geojsonToWkt("Polygon", Seq(Seq(ext, hole)))
      === Some("POLYGON ((0 0, 2 0, 2 2, 0 0))"))
    assert(LongTail.geojsonToWkt("Point", Seq(Seq(Seq(("31.18", "36.9355")))))
      === Some("POINT (31.18 36.9355)"))
    assert(LongTail.geojsonToWkt("MultiPolygon", Seq(Seq(ext, hole), Seq(ext)))
      === Some("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 0)), ((0 0, 2 0, 2 2, 0 0)))"))
    assert(LongTail.geojsonToWkt("GeometryCollection", Nil) === None)
  }

  test("pleiades bbox renders the closed lower-left-first ring") {
    assert(LongTail.bboxWkt("1", "2", "3", "4")
      === "POLYGON ((1 2, 3 2, 3 4, 1 4, 1 2))")
  }

  test("ndl routing: topic type wins over inScheme; uniformTitles unmapped") {
    assert(LongTail.ndlClass("http://xmlns.com/foaf/0.1/Person",
      "http://id.ndl.go.jp/auth#topicalTerms") === Some("Person"))
    assert(LongTail.ndlClass("", "http://id.ndl.go.jp/auth#uniformTitles")
      === None)
    assert(LongTail.ndlClass("", "http://id.ndl.go.jp/auth#geographicNames")
      === Some("Place"))
    assert(LongTail.ndlClass("", "") === None)
  }

  test("viaf: nameType map, sourceID refusal, bnf hash sameAs ignore list") {
    assert(LongTail.viafClass("Personal") === Some("Person"))
    assert(LongTail.viafClass("Corporate") === Some("Group"))
    assert(LongTail.viafClass("Junk") === None)
    assert(LongTail.viafIdentifier("sourceID/abc") === None)
    assert(LongTail.viafIdentifier("12345") === Some("12345"))
    assert(LongTail.viafIgnoreSameas("http://data.bnf.fr/#owl:Thing"))
  }

  test("orcid date: padding, day default, bare year, missing year") {
    assert(LongTail.orcidDate(Some("1990"), Some("7"), Some("3"))
      === Some("1990-07-03"))
    assert(LongTail.orcidDate(Some("1990"), Some("11"), None)
      === Some("1990-11-01"))
    assert(LongTail.orcidDate(Some("1990"), None, Some("3")) === Some("1990"))
    assert(LongTail.orcidDate(None, Some("7"), Some("3")) === None)
  }

  test("snac event property is event.lower(), quirk included") {
    assert(LongTail.snacProperty("Birth") === Some("birth")) // not 'born'
    assert(LongTail.snacProperty("Activity") === Some("activity"))
    assert(LongTail.snacProperty("Party") === None)
  }
}
