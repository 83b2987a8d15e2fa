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
    assert(rng("6000") === None) // Hebrew-calendar years unsupported, documented
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
