package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LaMerge
import graft.operators.LaMerge._

/** Golden-fixture tests for the full record merger, one per reference rule
  * (`pipeline/process/merger.py:86-958`). */
class LaMergeSpec extends AnyFunSuite {

  private val cfg = MergeConfig(internalSources = Set("ycba", "ypm"))

  private def rec(id: String, rtype: String = "Person", label: String = null,
      source: String = "ycba"): LaRecord =
    LaRecord(id, rtype, label, source)

  // --- type conflict (merger.py:683-694) ---

  test("same types merge; conflicting types abort the pair") {
    assert(resolveType("Person", "Person").contains("Person"))
    assert(resolveType("Person", "Group").isEmpty)
  }

  test("Language/Material/etc absorb Type, keeping the special class") {
    assert(resolveType("Language", "Type").contains("Language"))
    assert(resolveType("Type", "Material").contains("Material"))
    assert(resolveType("Type", "Type").contains("Type"))
    assert(resolveType("Language", "Material").isEmpty)
  }

  test("type-conflicting candidate is skipped, fold continues") {
    val out = mergeCluster(Seq(
      rec("a", "Type"),
      rec("b", "Language").copy(equivalent = Seq("e1")),
      rec("c", "Material").copy(equivalent = Seq("e2")), // Language vs Material: skip
      rec("d", "Type").copy(equivalent = Seq("e3"))), cfg).get
    assert(out.record.rtype == "Language")
    // the conflicting candidate contributes no data but IS counted
    // (merger.py:1007-1015 appends the source even after an abort)
    assert(out.nMerged == 4)
    assert(out.record.equivalent == Seq("e1", "e3"))
  }

  // --- should_merge veto (merger.py:926-958, ycba/mapper.py:13-27) ---

  test("wikidata record never merges into an object/work base") {
    val base = rec("a", "HumanMadeObject", "obj", "ycba")
    val wd = rec("b", "HumanMadeObject", "wd", "wikidata")
      .copy(equivalent = Seq("eq1"))
    val out = mergeCluster(Seq(base, wd), cfg).get
    assert(out.nMerged == 1)
    assert(out.record.equivalent.isEmpty)
    // but a Person base accepts wikidata
    val p = mergeCluster(Seq(rec("a", "Person"),
      rec("b", "Person", source = "wikidata").copy(equivalent = Seq("eq1"))), cfg).get
    assert(p.nMerged == 2 && p.record.equivalent == Seq("eq1"))
  }

  // --- pre_merge_fixes (merger.py:18-35) ---

  test("external Place part_of trumps internal part_of") {
    val a = rec("a", "Place", source = "ycba").copy(partOf = Seq("internalParent"))
    val b = rec("b", "Place", source = "tgn").copy(partOf = Seq("tgnParent"))
    val out = mergeCluster(Seq(a, b), cfg).get
    assert(out.record.partOf == Seq("tgnParent"))
    // no external part_of -> internal kept
    val out2 = mergeCluster(Seq(a, rec("b", "Place", source = "tgn")), cfg).get
    assert(out2.record.partOf == Seq("internalParent"))
  }

  // --- identified_by (merger.py:750-842) ---

  private def nm(content: String, cls: Seq[String] = Nil, langs: Seq[String] = Nil) =
    LaName("Name", content, cls, langs)

  test("names dedupe on trim-lower content; identifiers separately") {
    val a = rec("a").copy(identifiedBy = Seq(nm("Rembrandt"), LaName("Identifier", "123", Nil, Nil)))
    val b = rec("b").copy(identifiedBy = Seq(nm("  rembrandt "), nm("Van Rijn"),
      LaName("Identifier", "123", Nil, Nil), LaName("Identifier", "456", Nil, Nil)))
    val out = mergeCluster(Seq(a, b), cfg).get
    assert(out.record.identifiedBy.map(_.content) ==
      Seq("Rembrandt", "123", "Van Rijn", "456"))
  }

  test("second primary name is demoted unless from an internal source") {
    val a = rec("a").copy(identifiedBy = Seq(nm("First", Seq(primaryNameId))))
    val ext = rec("b", source = "viaf").copy(identifiedBy = Seq(nm("Second", Seq(primaryNameId))))
    val out = mergeCluster(Seq(a, ext), cfg).get
    assert(out.record.identifiedBy.find(_.content == "Second").get.classifiedAs.isEmpty)
    // internal source keeps its primary flag (final mapper elects later)
    val int2 = rec("b", source = "ypm").copy(identifiedBy = Seq(nm("Second", Seq(primaryNameId))))
    val out2 = mergeCluster(Seq(a, int2), cfg).get
    assert(out2.record.identifiedBy.find(_.content == "Second").get
      .classifiedAs.contains(primaryNameId))
  }

  test("matched name gains primary only if none exists and it isn't alternate") {
    // no primary yet: matching content with primary flag promotes the match
    val a = rec("a").copy(identifiedBy = Seq(nm("X")))
    val b = rec("b").copy(identifiedBy = Seq(nm("x", Seq(primaryNameId))))
    val out = mergeCluster(Seq(a, b), cfg).get
    assert(out.record.identifiedBy.head.classifiedAs.contains(primaryNameId))
    // alternate-flagged match never gains primary
    val a2 = rec("a").copy(identifiedBy = Seq(nm("X", Seq(alternateNameId))))
    val out2 = mergeCluster(Seq(a2, b), cfg).get
    assert(!out2.record.identifiedBy.head.classifiedAs.contains(primaryNameId))
  }

  test("matched name unions languages and other classifications") {
    val a = rec("a").copy(identifiedBy = Seq(nm("X", Seq("cls1"), Seq("en"))))
    val b = rec("b").copy(identifiedBy = Seq(nm("x", Seq("cls1", "cls2"), Seq("en", "fr"))))
    val out = mergeCluster(Seq(a, b), cfg).get
    val main = out.record.identifiedBy.head
    assert(main.classifiedAs == Seq("cls1", "cls2"))
    assert(main.languages == Seq("en", "fr"))
  }

  // --- referred_to_by (merger.py:844-872) ---

  test("statements dedupe by content; at most one AI-generated statement") {
    val a = rec("a").copy(referredToBy = Seq(LaStatement(null, "AI generated bio v1")))
    val b = rec("b").copy(referredToBy = Seq(
      LaStatement(null, "AI generated bio v2"), // blocked: base already has AI
      LaStatement(null, "AI generated bio v1"), // blocked: dup
      LaStatement(null, "human note"),
      LaStatement("stmt9", null)))              // id-only entry: deduped by id
    val out = mergeCluster(Seq(a, b), cfg).get
    assert(out.record.referredToBy.map(s => Option(s.content).getOrElse(s.id)) ==
      Seq("AI generated bio v1", "human note", "stmt9"))
  }

  // --- dimensions (merger.py:358-378) ---

  test("dimensions are identical only on (class, value, unit)") {
    val a = rec("a", "HumanMadeObject").copy(dimensions = Seq(LaDim("h", 10, "cm")))
    val b = rec("b", "HumanMadeObject").copy(dimensions =
      Seq(LaDim("h", 10, "cm"), LaDim("h", 10, "in"), LaDim("w", 10, "cm")))
    val out = mergeCluster(Seq(a, b), cfg).get
    assert(out.record.dimensions.size == 3)
  }

  // --- timespan (merger.py:542-622) ---

  test("end-of-year fixup: [Y-01-01, Y+1-01-01] clamps to Y-12-31") {
    val ts = fixEndOfYear(LaTimespan("1900-01-01T00:00:00Z", "1901-01-01T00:00:00Z", false))
    assert(ts.end == "1900-12-31T23:59:59Z")
    // non-01-01 spans untouched
    val ts2 = fixEndOfYear(LaTimespan("1900-03-01T00:00:00Z", "1901-01-01T00:00:00Z", false))
    assert(ts2.end == "1901-01-01T00:00:00Z")
  }

  test("most specific interval wins; estimated span is thrown out") {
    val wide = LaTimespan("1900-01-01T00:00:00Z", "1910-01-01T00:00:00Z", false)
    val tight = LaTimespan("1905-01-01T00:00:00Z", "1905-06-01T00:00:00Z", false)
    assert(mergeTimespan(wide, tight) == tight)
    assert(mergeTimespan(tight, wide) == tight)   // strictly-smaller only
    val est = wide.copy(estimated = true)
    assert(mergeTimespan(est, wide) == wide)      // estimated current replaced
    // unparseable current treated as infinitely wide
    val broken = LaTimespan("not a date", "also not", false)
    assert(mergeTimespan(broken, wide) == wide)
    // zero-length spans: timedelta(0) is falsy in the reference
    // (merger.py:622), so a zero-length incoming never replaces, and a
    // zero-length current is unbeatable (nothing is strictly < 0)
    val zero = LaTimespan("1905-01-01T00:00:00Z", "1905-01-01T00:00:00Z", false)
    assert(mergeTimespan(wide, zero) == wide)
    assert(mergeTimespan(zero, tight) == zero)
  }

  // --- Place geometry (merger.py:177-244) ---

  test("Place geometry elects polygon > point > none, then precision") {
    val pt = "POINT (10.5 20.5)"
    val ptPrecise = "POINT (10.523 20.547)"
    val poly = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    val a = rec("a", "Place").copy(definedBy = pt)
    assert(mergeCluster(Seq(a, rec("b", "Place").copy(definedBy = poly)), cfg)
      .get.record.definedBy == poly)
    assert(mergeCluster(Seq(a, rec("b", "Place").copy(definedBy = ptPrecise)), cfg)
      .get.record.definedBy == ptPrecise)
    assert(mergeCluster(Seq(rec("a", "Place").copy(definedBy = poly),
      rec("b", "Place").copy(definedBy = pt)), cfg).get.record.definedBy == poly)
    // non-Place types keep the base geometry (copy-if-absent only)
    assert(mergeCluster(Seq(rec("a").copy(definedBy = pt),
      rec("b").copy(definedBy = poly)), cfg).get.record.definedBy == pt)
  }

  // --- id-set unions + self exclusion (merger.py:167-175, :892-898) ---

  test("broader/part_of union excludes the record's own id") {
    val a = rec("a", "Type").copy(broader = Seq("t1"))
    val b = rec("b", "Type").copy(broader = Seq("t1", "t2", "a"))
    val out = mergeCluster(Seq(a, b), cfg).get
    assert(out.record.broader == Seq("t1", "t2"))
  }

  test("copy-if-absent takes the whole incoming field when base lacks it") {
    val a = rec("a")
    val b = rec("b", label = "label-b").copy(
      equivalent = Seq("e1"), residence = Seq("r1"), contactPoints = Seq("c@x"))
    val out = mergeCluster(Seq(a, b), cfg).get
    assert(out.record.label == "label-b")
    assert(out.record.equivalent == Seq("e1"))
    assert(out.record.residence == Seq("r1"))
    assert(out.record.contactPoints == Seq("c@x"))
  }

  test("representation/subject_of dedupe by access-point id") {
    val a = rec("a").copy(representationAps = Seq("ap1"), subjectOfAps = Seq("s1"))
    val b = rec("b").copy(representationAps = Seq("ap1", "ap2"), subjectOfAps = Seq("s1", "s2"))
    val out = mergeCluster(Seq(a, b), cfg).get
    assert(out.record.representationAps == Seq("ap1", "ap2"))
    assert(out.record.subjectOfAps == Seq("s1", "s2"))
  }

  test("sources list counts veto-passing candidates even on type conflict") {
    val out = mergeCluster(Seq(rec("a", source = "ycba"),
      rec("b", "Group", source = "ulan"),     // type conflict: no data, still listed
      rec("c", source = "viaf")), cfg).get
    assert(out.sources == Seq("ycba", "ulan", "viaf"))
    // a should_merge veto really does drop the source
    val vetoed = mergeCluster(Seq(rec("a", "HumanMadeObject", source = "ycba"),
      rec("b", "HumanMadeObject", source = "wikidata")), cfg).get
    assert(vetoed.sources == Seq("ycba"))
  }
}
