package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Cleaner, LaMerge}
import graft.operators.LaMerge.{LaName, LaRecord, LaTimespan}
import graft.operators.Cleaner._

/** Golden-fixture tests for the final Cleaner (M13,
  * `pipeline/sources/lux/final/mapper.py`). */
class CleanerSpec extends AnyFunSuite {

  private def nm(content: String, cls: Seq[String] = Nil, langs: Seq[String] = Nil) =
    LaName("Name", content, cls, langs)
  private def rec(names: LaName*): LaRecord =
    LaRecord("r1", "Person", "Label1", "src").copy(identifiedBy = names.toVector)
  private def primaryOf(names: Seq[LaName]): Option[String] =
    names.find(n => n.ntype == "Name" && n.classifiedAs.contains(primaryNameId))
      .map(_.content)

  // --- property dedupe (:649-663) ---
  test("dedupeIds keeps first occurrence, passes empties through") {
    assert(dedupeIds(Seq("a", "b", "a", "", "c", "b")) == Seq("a", "b", "c", ""))
  }

  // --- webpage dedupe (:713-776) ---
  test("normalizeUrl: scheme default, www strip, trailing slash strip") {
    assert(normalizeUrl("https://www.example.org/page/") == "https://example.org/page")
    assert(normalizeUrl("example.org/x") == "http://example.org/x")
    assert(normalizeUrl("http://example.org/x?q=1#f") == "http://example.org/x")
  }

  test("dedupeWebpages drops scheme/www/slash variants of kept pages") {
    assert(dedupeWebpages(Seq(
      "http://example.org/p",
      "https://www.example.org/p/",  // variant of the first
      "http://other.org/q")) == Seq("http://example.org/p", "http://other.org/q"))
    // kept page whose original differs from normal form is lost (ws[k] miss)
    assert(dedupeWebpages(Seq("http://www.a.org/", "http://b.org")) == Seq("http://b.org"))
  }

  // --- timespan defaults (:665-676) ---
  test("open timespans get the 9999 sentinels") {
    assert(timespanDefaults("1900-01-01T00:00:00", null) ==
      ("1900-01-01T00:00:00", "9999-12-31T23:59:59"))
    assert(timespanDefaults(null, "1900-12-31T23:59:59") ==
      ("-9999-01-01T00:00:00", "1900-12-31T23:59:59"))
  }

  // --- metatypes (:678-711) ---
  test("equivalents inject metatype classifications once") {
    assert(injectMetatypes(Seq("c1"), Seq("eqA", "eqB"),
      Map("eqA" -> Seq("mt1", "c1"), "eqB" -> Seq("mt1"))) == Seq("c1", "mt1"))
  }

  // --- primary election (:366-541) ---
  test("single existing primary is kept") {
    val out = electNames(rec(nm("Long Name Here", Seq(primaryNameId)), nm("Short"))).get
    assert(primaryOf(out).contains("Long Name Here"))
  }

  test("primary+alternate name: first becomes primary, later ones alternate") {
    val out = electNames(rec(
      nm("A", Seq(primaryNameId, alternateNameId)),
      nm("B", Seq(primaryNameId, alternateNameId)))).get
    val a = out.find(_.content == "A").get
    val b = out.find(_.content == "B").get
    // the winner also gains sortName (no sort name existed, :567-576)
    assert(a.classifiedAs == Seq(primaryNameId, sortNameId))
    assert(b.classifiedAs == Seq(alternateNameId))
  }

  test("both-flag resolution removes exactly ONE flag entry (advice r15)") {
    // mapper.py:405-421 scans for the FIRST matching entry and
    // list.remove()s that one only — duplicated flags survive. [P,A,A]
    // as the bucket's first both-flag name: remove one A -> [P,A];
    // a later [A,P,P]: remove the first P -> [A,P]
    val out = electNames(rec(
      nm("First Name", Seq(primaryNameId, alternateNameId, alternateNameId)),
      nm("Second Name", Seq(alternateNameId, primaryNameId, primaryNameId)))).get
    val a = out.find(_.content == "First Name").get
    val b = out.find(_.content == "Second Name").get
    // winner keeps its duplicate alternate (plus the sort fallback)
    assert(a.classifiedAs == Seq(primaryNameId, alternateNameId, sortNameId))
    assert(b.classifiedAs == Seq(alternateNameId, primaryNameId))
  }

  test("no primary: unclassified shortest wins; alternates excluded") {
    val out = electNames(rec(
      nm("Zebra Longname"), nm("Al", Seq(alternateNameId)), nm("Betty"))).get
    assert(primaryOf(out).contains("Betty"))
  }

  test("officialName short-circuits candidate selection") {
    val out = electNames(rec(
      nm("aa"), nm("Official Name Co", Seq(officialNameId)))).get
    assert(primaryOf(out).contains("Official Name Co"))
  }

  test("everything alternate: first name force-promoted, flags overwritten") {
    val out = electNames(rec(
      nm("A", Seq(alternateNameId)), nm("B", Seq(alternateTitleId)))).get
    val a = out.find(_.content == "A").get
    // DOUBLED primary: mapper.py:480 overwrites to [primary] and :485
    // appends primary unconditionally (w2b differential find)
    assert(a.classifiedAs == Seq(primaryNameId, primaryNameId, sortNameId))
  }

  test("a doubled-primary loser KEEPS the sort fallback (empty != deleted)") {
    // mapper.py:530 dels the key only when len==1; the [P,P] overwrite
    // target strips to an empty-but-PRESENT list, so :574's key guard
    // passes and the sort flag lands on a name with no other classes
    val out = electNames(rec(
      nm("Long Alt", Seq(alternateNameId), Seq("en", "fr")),
      nm("Longer Title", Seq(alternateTitleId), Seq("en")),
      nm("Fr", Seq(primaryNameId), Seq("fr")))).get
    val both = out.find(_.content == "Long Alt").get
    assert(both.classifiedAs == Seq(sortNameId))
    assert(out.find(_.content == "Fr").get.classifiedAs == Seq(primaryNameId))
  }

  test("a primary de-flagged by a later bucket loses the sort fallback") {
    // mapper.py:574 — `if "classified_as" in target`: the en-elected
    // name loses its only (primary) class to fr's shorter primary
    // (:530 del), so the fallback silently skips the sort flag
    val out = electNames(rec(
      nm("Long Both", langs = Seq("en", "fr")),
      nm("Fr", Seq(primaryNameId), Seq("fr")))).get
    val both = out.find(_.content == "Long Both").get
    assert(both.classifiedAs.isEmpty) // elected in en, stripped by fr
    assert(!out.exists(_.classifiedAs.contains(sortNameId)))
  }

  test("sub-3-char Place names rotate behind longer candidates") {
    val r = rec(nm("GB"), nm("Great Britain")).copy(rtype = "Place")
    assert(primaryOf(electNames(r).get).contains("Great Britain"))
    // non-Place keeps the shortest
    assert(primaryOf(electNames(rec(nm("GB"), nm("Great Britain"))).get).contains("GB"))
  }

  test("two primaries: shortest wins unless it is an all-caps acronym") {
    val out = electNames(rec(
      nm("IBM", Seq(primaryNameId)),
      nm("International Business Machines", Seq(primaryNameId)))).get
    assert(primaryOf(out).contains("International Business Machines"))
    assert(out.find(_.content == "IBM").get.classifiedAs.isEmpty)
    // without the acronym trigger the shortest primary wins
    val out2 = electNames(rec(
      nm("Ibm Co", Seq(primaryNameId)),
      nm("International Business Machines", Seq(primaryNameId)))).get
    assert(primaryOf(out2).contains("Ibm Co"))
  }

  test("election runs per language bucket") {
    val out = electNames(rec(
      nm("English Name", langs = Seq("en")),
      nm("Nom français", langs = Seq("fr")))).get
    assert(out.count(_.classifiedAs.contains(primaryNameId)) == 2)
  }

  // --- sort name (:545-576) ---
  test("english sort name wins; losers are de-flagged") {
    val out = electNames(rec(
      nm("Fr sort", Seq(sortNameId), Seq("fr")),
      nm("En sort", Seq(sortNameId), Seq("en")))).get
    assert(out.filter(_.classifiedAs.contains(sortNameId)).map(_.content) == Seq("En sort"))
  }

  test("no sort name: the english/no-lang primary gains the flag") {
    val out = electNames(rec(nm("Solo"))).get
    assert(out.head.classifiedAs.toSet == Set(primaryNameId, sortNameId))
  }

  // --- fallbacks (:578-612) ---
  test("no names: label is copied as primary; else Unnamed <type>") {
    val out = electNames(LaRecord("r1", "Group", "The Label", "src")).get
    assert(out.map(_.content) == Seq("The Label"))
    // the fallback runs after the election, so it never gains a sort name
    assert(out.head.classifiedAs == Seq(primaryNameId))
    val un = electNames(LaRecord("r2", "Place", null, "src")).get
    assert(un.map(_.content) == Seq("Unnamed Place"))
  }

  test("a record holding only Identifiers keeps them and gets no fallback (:578)") {
    val out = electNames(LaRecord("r1", "Person", "Lbl", "src").copy(
      identifiedBy = Seq(LaName("Identifier", "ID-1", Nil, Nil)))).get
    assert(out.map(_.content) == Seq("ID-1"))
    assert(!out.exists(_.ntype == "Name"))
  }

  test("nameless pointer DigitalObject is dropped") {
    assert(electNames(LaRecord("r1", "DigitalObject", null, "src")).isEmpty)
    assert(clean(LaRecord("r1", "DigitalObject", null, "src")).isEmpty)
  }

  // --- display ordering (:617-646) ---
  test("names order by language score with primary bonus, stable") {
    val out = electNames(rec(
      nm("zh", langs = Seq("zh")),
      nm("plain"),
      nm("fr", langs = Seq("fr")),
      nm("en-primary", Seq(primaryNameId), Seq("en")),
      nm("en-alt", Seq(alternateNameId), Seq("en")))).get
    assert(out.map(_.content) ==
      Seq("en-primary", "en-alt", "fr", "zh", "plain"))
  }

  // --- full pass ---
  test("clean composes dedupe + webpages + defaults + metatypes + election") {
    val r = LaRecord("r1", "Person", "P", "src").copy(
      identifiedBy = Vector(nm("Name A")),
      classifiedAs = Seq("c1", "c1", "c2"),
      equivalent = Seq("eqM"),
      subjectOfAps = Seq("http://a.org/x", "https://www.a.org/x/"),
      timespan = Some(LaTimespan("1900-01-01T00:00:00", null, false)))
    val out = clean(r, Map("eqM" -> Seq("mt9"))).get
    assert(out.classifiedAs == Seq("c1", "c2", "mt9"))
    assert(out.subjectOfAps == Seq("http://a.org/x"))
    assert(out.timespan.get.end == "9999-12-31T23:59:59")
    assert(primaryOf(out.identifiedBy).contains("Name A"))
  }
}
