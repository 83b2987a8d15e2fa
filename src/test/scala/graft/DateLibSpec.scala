package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DateLib

class DateLibSpec extends AnyFunSuite {
  private def rng(s: String, prec: String = ""): Option[(String, String)] =
    DateLib.makeDatetime(s, prec).map(r => (r.begin, r.end))

  test("plain ISO year/month/day precision inference") {
    assert(rng("1985") === Some(("1985-01-01T00:00:00", "1985-12-31T23:59:59")))
    assert(rng("1985-04") === Some(("1985-04-01T00:00:00", "1985-04-30T23:59:59")))
    assert(rng("1985-04-12") === Some(("1985-04-12T00:00:00", "1985-04-12T23:59:59")))
    assert(rng("1985-04-12T23:20:30") === Some(("1985-04-12T23:20:30", "1985-04-12T23:20:30")))
  }

  test("compact numeric forms") {
    assert(rng("19850412") === Some(("1985-04-12T00:00:00", "1985-04-12T23:59:59")))
    assert(rng("198504") === Some(("1985-04-01T00:00:00", "1985-04-30T23:59:59")))
  }

  test("BCE forms never touch TimestampType semantics") {
    assert(rng("-0500") === Some(("-0500-01-01T00:00:00", "-0500-12-31T23:59:59")))
    // human numbering: year N BCE = ISO -(N-1) (astronomical, year 0 = 1 BCE)
    assert(rng("1000 BC") === Some(("-0999-01-01T00:00:00", "-0999-12-31T23:59:59")))
    assert(rng("250 BCE").get._1.startsWith("-0249"))
    assert(rng("1 BC").get._1 === "0000-01-01T00:00:00")
  }

  test("BC suffix and century-BCE phrases agree on one convention") {
    // 10th century BCE covers years 1000..901 BCE = ISO -999..-900;
    // "1000 BC" must land on the first year of that span.
    assert(rng("10th century BCE").get._1 === rng("1000 BC").get._1)
  }

  test("EDTF masked and approximate years") {
    assert(rng("19XX") === Some(("1900-01-01T00:00:00", "1999-12-31T23:59:59")))
    assert(rng("185X") === Some(("1850-01-01T00:00:00", "1859-12-31T23:59:59")))
    // the X run determines the span width: 1XX is a 3-digit year range
    assert(rng("1XX") === Some(("0100-01-01T00:00:00", "0199-12-31T23:59:59")))
    assert(rng("19X") === Some(("0190-01-01T00:00:00", "0199-12-31T23:59:59")))
    assert(rng("1985?") === Some(("1984-01-01T00:00:00", "1986-12-31T23:59:59")))
  }

  test("century phrases") {
    assert(rng("19th century") === Some(("1800-01-01T00:00:00", "1899-12-31T23:59:59")))
    val bce = rng("5th century BCE").get
    assert(bce._1 === "-0499-01-01T00:00:00") // ISO year -499 = 500 BCE..401 BCE span start
  }

  test("month-name forms") {
    assert(rng("September 2002") === Some(("2002-09-01T00:00:00", "2002-09-30T23:59:59")))
    assert(rng("19 September 2002").get._1 === "2002-09-19T00:00:00")
    assert(rng("September 19, 2002").get._1 === "2002-09-19T00:00:00")
  }

  test("garbage and sentinels rejected") {
    assert(rng("9999") === None)
    assert(rng("0000") === None)
    assert(rng("not a date") === None)
    assert(rng(null) === None)
  }

  test("F15: years above 4500 convert through the Hebrew calendar") {
    // Rosh Hashanah 5784 (Tishrei 1) = 2023-09-16
    assert(rng("5784-07-01").get ===
      ("2023-09-16T00:00:00", "2023-09-16T23:59:59"))
    // Pesach 5784 (Nisan 15, leap year) = 2024-04-23
    assert(rng("5784-01-15").get._1 === "2024-04-23T00:00:00")
    // Rosh Hashanah 5785 = 2024-10-03 (383-day deficient leap 5784 between)
    assert(rng("5785-07-01").get._1 === "2024-10-03T00:00:00")
    // Rosh Hashanah 5700 = 1939-09-14
    assert(rng("5700-07-01").get._1 === "1939-09-14T00:00:00")
    // year-only anchors at Nisan 1 (the parse clamps month/day to 1),
    // year precision spans one Gregorian year from the converted day
    assert(rng("5784").get ===
      ("2024-04-09T00:00:00", "2025-04-08T23:59:59"))
    // invalid for the year: Adar II in non-leap 5783; Kislev 30 in
    // deficient 5784
    assert(rng("5783-13-01") === None)
    assert(rng("5784-09-30") === None)
    // BCE years are NOT Hebrew: -5000 parses as a plain ISO year
    assert(rng("-5000").get._1 === "-5000-01-01T00:00:00")
  }

  test("wikidata precision wrapper") {
    assert(DateLib.makeDatetimeWikidata("+1952-03-11T00:00:00Z", 11).get.begin
      === "1952-03-11T00:00:00")
    assert(DateLib.makeDatetimeWikidata("+1952-00-00T00:00:00Z", 9).get.begin
      === "1952-01-01T00:00:00")
    assert(DateLib.makeDatetimeWikidata("+1952-03-11T00:00:00Z", 8) === None)
  }

  test("BCE-safe epoch seconds and year extraction") {
    assert(DateLib.epochSeconds("1970-01-01T00:00:00") === Some(0L))
    assert(DateLib.epochSeconds("-0001-01-01T00:00:00").exists(_ < -62100000000L))
    assert(DateLib.yearOf("-0500-01-01") === Some(-500))
    assert(DateLib.yearOf("1985-04-12") === Some(1985))
  }

  test("lifespan sanity bound (<=122 years, death after birth)") {
    assert(DateLib.plausibleLifespan("1900-01-01T00:00:00", "1999-12-31T23:59:59"))
    assert(!DateLib.plausibleLifespan("1900-01-01T00:00:00", "1899-01-01T00:00:00"))
    assert(!DateLib.plausibleLifespan("1800-01-01T00:00:00", "1999-01-01T00:00:00"))
    assert(DateLib.plausibleLifespan("garbage", "1999-01-01T00:00:00"))
  }
}
