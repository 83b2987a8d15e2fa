package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.WdClaims
import graft.pipeline.WdClaims._

/** M3/M4/M5 against handmade claim fixtures mirroring
  * `wikidata/mapper.py:297-658` behaviors. */
class WdClaimsSpec extends AnyFunSuite {

  // --- process_labels (:311-368) ---

  test("must-have languages processed in priority order, content deduped") {
    val r = processLabels(Seq(
      "fr" -> "Rembrandt", "en" -> "Rembrandt", "de" -> "Rembrandt van Rijn"))
    // en before fr/de regardless of claim order; same content unions langs
    assert(r.names == Seq(
      WdName("Rembrandt", Seq("en", "fr")),
      WdName("Rembrandt van Rijn", Seq("de"))))
    assert(r.label.contains("Rembrandt"))
  }

  test("fallback walks all claims only when no must-have lang hit") {
    val r = processLabels(Seq("ru" -> "Рембрандт", "it" -> "Rembrandt"))
    assert(r.names == Seq(
      WdName("Рембрандт", Seq("ru")), WdName("Rembrandt", Seq("it"))))
    assert(r.label.contains("Рембрандт"))
    // with a must-have hit, non-must-have langs are NOT processed
    val r2 = processLabels(Seq("ru" -> "Рембрандт", "en" -> "Rembrandt"))
    assert(r2.names == Seq(WdName("Rembrandt", Seq("en"))))
  }

  test("mul appends without language and without content dedupe (:343-348)") {
    val r = processLabels(Seq("ru" -> "X", "mul" -> "X"))
    assert(r.names == Seq(WdName("X", Seq("ru")), WdName("X", Nil)))
    // unknown langs are skipped entirely
    val r2 = processLabels(Seq("xx" -> "Y"))
    assert(r2.names.isEmpty && r2.label.isEmpty)
  }

  test("descriptions only for must-have languages") {
    val r = processLabels(Seq("en" -> "N"),
      Seq("ru" -> "rudesc", "en" -> "endesc", "zh" -> "zhdesc"))
    assert(r.descriptions == Seq(
      WdName("endesc", Seq("en")), WdName("zhdesc", Seq("zh"))))
  }

  test("process_only_label priority (:297-309)") {
    assert(onlyLabel(Seq("ru" -> "R", "fr" -> "F")).contains("F"))
    assert(onlyLabel(Seq("ru" -> "R", "mul" -> "M")).contains("R"))
    assert(onlyLabel(Seq("xx" -> "X", "mul" -> "M")).contains("M"))
    assert(onlyLabel(Seq("xx" -> "X")).isEmpty)
  }

  // --- process_equivalents (:370-417) ---

  test("ext_hash template expansion in table order") {
    val eqs = processEquivalents(Map(
      "P214" -> Seq("123"), "P2163" -> Seq("45"), "P268" -> Seq("999x")))
    assert(eqs == Seq(
      "http://id.worldcat.org/fast/45",
      "https://viaf.org/viaf/123",
      "http://data.bnf.fr/ark:/12148/cb999x"))
  }

  test("P244 splits LC subjects vs names by first char; unknown dropped") {
    val eqs = processEquivalents(Map("P244" -> Seq("n79021164", "sh85101712", "x1")))
    assert(eqs == Seq(
      "http://id.loc.gov/authorities/names/n79021164",
      "http://id.loc.gov/authorities/subjects/sh85101712"))
  }

  test("P6766 WOF ids chunk into 3-digit path segments with remainder tail") {
    assert(wofUrl("890424287") ==
      "https://data.whosonfirst.org/890/424/287/890424287.geojson")
    assert(wofUrl("85633041") ==
      "https://data.whosonfirst.org/856/330/41/85633041.geojson")
    assert(wofUrl("12") == "https://data.whosonfirst.org/12/12.geojson")
  }

  // --- clean_date / process_person (:79-96, :547-658) ---

  test("clean_date strips +/Z and clamps -00 but not a BCE sign") {
    assert(cleanDate("+1952-00-00T00:00:00Z") == "1952-01-01T00:00:00")
    assert(cleanDate("-0010-01-00T00:00:00Z") == "-0010-01-01T00:00:00")
  }

  test("person birth/death with precision ranges and display dates") {
    val r = processPerson(
      birth = Some(WdDate("+1606-07-15T00:00:00Z", 11)),
      death = Some(WdDate("+1669-00-00T00:00:00Z", 9)),
      birthPlace = Seq("Q365", "Q2"), deathPlace = Nil,
      genders = Seq("Q6581097", "Qbogus"), nationalities = Seq("Q55", "Q30"))
    val b = r.born.get
    assert(b.begin == "1606-07-15T00:00:00" && b.end == "1606-07-15T23:59:59")
    assert(b.display == "1606-07-15")
    // "can only be born in one place": first wins
    assert(b.place.contains("http://www.wikidata.org/entity/Q365"))
    val d = r.died.get
    assert(d.begin == "1669-01-01T00:00:00" && d.end == "1669-12-31T23:59:59")
    assert(r.genders == Seq("male")) // unknown dropped
    assert(r.nationalities == Seq("http://vocab.getty.edu/aat/300107956"))
  }

  test("place-only event when no parseable date; sub-year precision rejected") {
    val r = processPerson(None, Some(WdDate("+1669-01-01T00:00:00Z", 8)),
      birthPlace = Seq("Q365"), deathPlace = Nil, genders = Nil, nationalities = Nil)
    val b = r.born.get
    assert(b.begin == null && b.place.contains("http://www.wikidata.org/entity/Q365"))
    assert(r.died.isEmpty) // precision 8 (decade): ignored (mapper.py:99-103)
  }
}
