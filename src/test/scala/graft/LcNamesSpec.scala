package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.LcNames
import graft.pipeline.LcNames.LcName

/** M1c: the LC authority mapper exemplar (`lc/mapper.py:187-340`). */
class LcNamesSpec extends AnyFunSuite {

  test("map_label: first value is the label, unknown languages dropped") {
    val (label, names) = LcNames.mapLabel(Seq(
      ("Twain, Mark", Some("en")), ("Твен, Марк", Some("xx")),
      ("Twain", None)))
    assert(label.contains("Twain, Mark"))
    assert(names === Seq(
      LcName("Twain, Mark", Some("en"), primary = true),
      LcName("Твен, Марк", None, primary = true), // xx not in process_langs
      LcName("Twain", None, primary = true)))
    assert(LcNames.mapLabel(Nil) === ((None, Nil)))
  }

  test("identifiesRWO filters: dbpedia drop, tgn -place strip, rwo skip") {
    val eqs = LcNames.selectEquivalents(
      idby = Seq(
        "http://dbpedia.org/resource/Mark_Twain",
        "http://vocab.getty.edu/tgn/7014463-place",
        "http://id.loc.gov/rwo/agents/n79021164",
        "https://keep.org/x"),
      exact = Nil, laterEarlier = Nil, close = Nil, isGroup = false)
    assert(eqs === Seq("http://vocab.getty.edu/tgn/7014463", "https://keep.org/x"))
  }

  test("a seen viaf suppresses exact-authority viaf duplicates") {
    val eqs = LcNames.selectEquivalents(
      idby = Seq("https://viaf.org/viaf/50566653"),
      exact = Seq("https://viaf.org/viaf/99999", "https://ex.org/e1"),
      laterEarlier = Nil, close = Nil, isGroup = false)
    assert(eqs === Seq("https://viaf.org/viaf/50566653", "https://ex.org/e1"))
  }

  test("later/earlier established forms skipped for Groups") {
    val later = Seq("https://later.org/l1")
    assert(LcNames.selectEquivalents(Nil, Nil, later, Nil, isGroup = false)
      === later)
    assert(LcNames.selectEquivalents(Nil, Nil, later, Nil, isGroup = true)
      === Nil)
  }

  test("close-match last resort: bnf dropped, wikidata caps the list at 4") {
    // 3 already present + wikidata -> 4 reached -> the loop breaks and
    // the trailing close uri is NOT added
    val eqs = LcNames.selectEquivalents(
      idby = Seq("https://a.org/1", "https://a.org/2", "https://a.org/3"),
      exact = Nil, laterEarlier = Nil,
      close = Seq("https://data.bnf.fr/ark:/x",
        "https://www.wikidata.org/entity/Q42", "https://close.org/tail"),
      isGroup = false)
    assert(eqs === Seq("https://a.org/1", "https://a.org/2", "https://a.org/3",
      "https://www.wikidata.org/entity/Q42"))
    // under the cap, non-wikidata close uris do get added
    val eqs2 = LcNames.selectEquivalents(
      idby = Seq("https://a.org/1"), exact = Nil, laterEarlier = Nil,
      close = Seq("https://www.wikidata.org/entity/Q42", "https://close.org/tail"),
      isGroup = false)
    assert(eqs2 === Seq("https://a.org/1",
      "https://www.wikidata.org/entity/Q42", "https://close.org/tail"))
  }

  test("lc loader: external-links sideload gates on subject and predicate") {
    assert(LcNames.externalLink(
      "<http://id.loc.gov/authorities/names/n79021164> <http://www.loc.gov/mads/rdf/v1#hasCloseExternalAuthority> <http://viaf.org/viaf/50566653> .")
      === Some(("n79021164", "http://viaf.org/viaf/50566653")))
    assert(LcNames.externalLink(
      "<http://id.loc.gov/authorities/names/n1> <http://www.loc.gov/mads/rdf/v1#hasNarrowerExternalAuthority> <http://x.org/1> .")
      === None)
    assert(LcNames.externalLink(
      "<http://other.example/n1> <http://www.loc.gov/mads/rdf/v1#hasCloseExternalAuthority> <http://x.org/1> .")
      === None)
  }

  test("lc loader: raw @id extraction and the record skips") {
    assert(LcNames.rawIdentifier("""{"a": 1, "@id": "http://id.loc.gov/authorities/names/n42"}""")
      === Some("n42"))
    assert(LcNames.rawIdentifier("no id here") === None)
    assert(LcNames.skipRecord("n42-781", Nil))
    assert(LcNames.skipRecord("n42", Seq(
      "http://id.loc.gov/authorities/names/collection_NamesUndifferentiated")))
    assert(!LcNames.skipRecord("n42", Seq(
      "http://id.loc.gov/authorities/names/collection_LCNAF")))
  }
}
