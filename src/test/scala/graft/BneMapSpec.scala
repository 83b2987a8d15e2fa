package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.BneMap

/** BNE mapper kernels (libraries/bne/mapper.py). */
class BneMapSpec extends AnyFunSuite {

  test("guessType: the geographic inScheme beats @type") {
    assert(BneMap.guessType("http://www.w3.org/2004/02/skos/core#Concept",
      "https://datos.bne.es/def/geograficos") === Some("Place"))
    assert(BneMap.guessType("http://www.w3.org/2004/02/skos/core#Concept", "")
      === Some("Type"))
    assert(BneMap.guessType("https://datos.bne.es/def/C1005", "") === Some("Person"))
    assert(BneMap.guessType("https://datos.bne.es/def/C1006", "") === Some("Group"))
    assert(BneMap.guessType("http://other.example/", "") === None)
  }

  test("labels: the dupes guard is REBUILT per prefLabel — only the " +
      "last pref blocks alts; alts dedupe against each other") {
    val names = BneMap.labels(
      prefs = Seq(("A", "en"), ("B", "xx")),
      alts = Seq(("A", None), ("B", Some("es")), ("C", Some("es")), ("C", None)))
    assert(names.map(n => (n.content, n.lang, n.primary)) === Seq(
      ("A", Some("en"), true),
      ("B", None, true),          // xx unmapped: label kept, lang dropped
      ("A", None, false),         // equal to an EARLIER pref: emitted
      ("C", Some("es"), false)))  // second C dropped (alt-alt dedupe)
  }

  test("labels: empty pref still resets the guard; empty alts dropped") {
    val names = BneMap.labels(
      prefs = Seq(("A", "en"), ("", "en")),
      alts = Seq(("A", None), ("", None)))
    // guard ended as {""} so alt A re-emits; empty alt never emits
    assert(names.map(_.content) === Seq("A", "A"))
  }

  test("personSames: move-to-end dedupe through both lists") {
    assert(BneMap.personSames(
      p5024 = Seq("u1", "u0"), sameAs = Seq("u0", "u9"),
      seeAlso = Seq("u1")) === Seq("u0", "u9", "u1"))
    assert(BneMap.personSames(
      p5024 = Seq("u1", "u1"), sameAs = Seq("u1", "u9"),
      seeAlso = Seq("u1")) === Seq("u9", "u1"))
    assert(BneMap.personSames(Nil, Nil, Nil) === Nil)
  }

  test("personDates: two-element P5010 backs the death ONLY when P5011 " +
      "is absent, and the death display stays the raw P5011") {
    val (b1, d1) = BneMap.personDates(Seq("1900", "1950"), None)
    assert(b1.get.begin === "1900-01-01T00:00:00")
    assert(b1.get.display === "[1900, 1950]")
    assert(d1.get.begin === "1950-01-01T00:00:00")
    assert(d1.get.display === "") // quirk: content=dod even on fallback
    val (_, d2) = BneMap.personDates(Seq("1900", "1950"), Some("1960"))
    assert(d2.get.begin === "1960-01-01T00:00:00")
    assert(d2.get.display === "1960")
    // unparseable birth keeps the event with empty bounds
    val (b3, d3) = BneMap.personDates(Seq("junk"), None)
    assert(b3 === Some(BneMap.EventSpan("", "", "junk")))
    assert(d3 === None)
    assert(BneMap.personDates(Nil, None) === (None, None))
  }

  test("checkLifespan: implausible spans clear BOTH events") {
    val (b, d) = BneMap.personDates(Seq("1800"), Some("1999"))
    assert(BneMap.checkLifespan(b, d) === (None, None)) // ~200 years
    val (b2, d2) = BneMap.personDates(Seq("1900"), Some("1980"))
    assert(BneMap.checkLifespan(b2, d2) === (b2, d2))
    // death before birth also clears
    val (b3, d3) = BneMap.personDates(Seq("1950"), Some("1900"))
    assert(BneMap.checkLifespan(b3, d3) === (None, None))
    // missing bounds never disqualify
    val (b4, d4) = BneMap.personDates(Seq("junk"), None)
    assert(BneMap.checkLifespan(b4, d4) === (b4, d4))
  }

  test("gender: instance map with ident passthrough") {
    assert(BneMap.gender("Masculino") === Some("male"))
    assert(BneMap.gender("Femenino") === Some("female"))
    assert(BneMap.gender("") === None)
    assert(BneMap.gender("Otro") === Some("gender:Otro"))
  }
}
