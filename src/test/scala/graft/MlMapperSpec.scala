package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.MlMapper
import graft.pipeline.MlMapper._

/** Fixture tests for the fiddly MlMapper branches the modular-arithmetic
  * oracle can't discriminate (mapper.py sections cited per case). */
class MlMapperSpec extends AnyFunSuite {
  private val I = MlMapper.InternalPfx

  private def preds(d: MlDoc, p: String): Seq[String] =
    d.triples.filter(_.predicate == p).map(_.obj)

  test("MFHD identifier blocks isCollectionItem even with a collection AP") {
    val rec = MlRecord(id = I + "x", rtype = "LinguisticObject",
      identified_by = Seq(Identifier("ils:yul:mfhd:123")),
      subject_of = Seq(SubjectOf(Seq(DigRef(Seq(
        "https://archives.yale.edu/foo"))))))
    assert(MlMapper.facetsOf(rec).isCollectionItem == 0)
    assert(MlMapper.facetsOf(rec.copy(identified_by = Nil)).isCollectionItem == 1)
  }

  test("only the FIRST access point of a digital carrier marks collection items") {
    val rec = MlRecord(id = I + "x", rtype = "HumanMadeObject",
      subject_of = Seq(SubjectOf(Seq(DigRef(Seq(
        "https://other.example/1", "https://archives.yale.edu/foo"))))))
    assert(MlMapper.facetsOf(rec).isCollectionItem == 0) // mapper.py:289
    // but ANY non-collection AP still counts for isOnline (mapper.py:806)
    assert(MlMapper.facetsOf(rec).isOnline == 1)
  }

  test("a yale-AP-only work is a collection item but NOT online") {
    val rec = MlRecord(id = I + "x", rtype = "VisualItem",
      subject_of = Seq(SubjectOf(Seq(DigRef(Seq(
        "https://search.library.yale.edu/catalog/1"))))))
    val f = MlMapper.facetsOf(rec)
    assert(f.isCollectionItem == 1 && f.isOnline == 0)
  }

  test("isOnline only applies to item/work prefixes") {
    val rec = MlRecord(id = I + "x", rtype = "Person",
      representation = Seq(Representation(Seq(DigRef(Seq("https://img/1"))))))
    val f = MlMapper.facetsOf(rec)
    assert(f.hasDigitalImage == 1 && f.isOnline == 0)
  }

  test("DigitalObject with a record-level access point is online") {
    val rec = MlRecord(id = I + "x", rtype = "DigitalObject",
      access_point = Seq("https://files.example/f1"))
    assert(MlMapper.facetsOf(rec).isOnline == 1)
  }

  test("isPublicDomain: works only, via creativecommons publicdomain") {
    val pd = Seq("https://creativecommons.org/publicdomain/zero/1.0/")
    assert(MlMapper.facetsOf(MlRecord(I + "w", "VisualItem",
      subject_to_class = pd)).isPublicDomain == 1)
    assert(MlMapper.facetsOf(MlRecord(I + "h", "HumanMadeObject",
      subject_to_class = pd)).isPublicDomain == 0) // item, not work
  }

  test("attributed agents feed shortcut triples but not lux:any; they hit refCtr") {
    val rec = MlRecord(id = I + "x", rtype = "HumanMadeObject",
      events = Map("produced_by" -> Event(
        carried_out_by = Seq(Ref(I + "direct")),
        attributed_by = Seq(Attribution(Seq(Assigned(
          carried_out_by = Seq(Ref(I + "attributed")))))))))
    val d = MlMapper.transform(rec)
    assert(preds(d, "lux:agentOfProduction").toSet ==
      Set(I + "direct", I + "attributed")) // mapper.py:368-390
    assert(preds(d, "lux:any") == Seq(I + "direct")) // attributed_by ignored
    assert(preds(d, "lux:refCtr") == Seq(I + "attributed"))
  }

  test("refCtr exclusion list drops globals") {
    val rec = MlRecord(id = I + "x", rtype = "HumanMadeObject",
      events = Map("produced_by" -> Event(
        attributed_by = Seq(Attribution(Seq(Assigned(
          carried_out_by = Seq(Ref(I + "excluded"), Ref(I + "kept")))))))))
    val d = MlMapper.transform(rec, refCtrExcludes = Set(I + "excluded"))
    assert(preds(d, "lux:refCtr") == Seq(I + "kept"))
  }

  test("influenced_by prefix comes from the inline type, else 'other'") {
    val rec = MlRecord(id = I + "x", rtype = "LinguisticObject",
      events = Map("created_by" -> Event(influenced_by =
        Seq(Ref(I + "p1", "Person"), Ref(I + "u1", null)))))
    val d = MlMapper.transform(rec)
    assert(preds(d, "lux:agentInfluencedCreation") == Seq(I + "p1"))
    assert(preds(d, "lux:otherInfluencedCreation") == Seq(I + "u1"))
  }

  test("duplicate agents duplicate shortcut triples but dedupe in any") {
    val a = Ref(I + "dup")
    val rec = MlRecord(id = I + "x", rtype = "HumanMadeObject",
      events = Map("produced_by" -> Event(
        carried_out_by = Seq(a),
        part = Seq(EventPart(carried_out_by = Seq(a))))))
    val d = MlMapper.transform(rec)
    assert(preds(d, "lux:agentOfProduction") == Seq(I + "dup", I + "dup"))
    assert(preds(d, "lux:any") == Seq(I + "dup"))
  }

  test("external refs never reach any/refCtr") {
    val rec = MlRecord(id = I + "x", rtype = "HumanMadeObject",
      events = Map("produced_by" -> Event(
        carried_out_by = Seq(Ref("http://vocab.getty.edu/ext")))))
    val d = MlMapper.transform(rec)
    assert(preds(d, "lux:agentOfProduction") == Seq("http://vocab.getty.edu/ext"))
    assert(preds(d, "lux:any").isEmpty && preds(d, "lux:refCtr").isEmpty)
  }

  test("Set records: setClassifiedAs + la:member_of") {
    val rec = MlRecord(id = I + "x", rtype = "Set",
      classified_as = Seq(Cls("aat:c1")), member_of = Seq(I + "parent"))
    val d = MlMapper.transform(rec)
    // twice, faithfully: once as the generic {pfx}ClassifiedAs (pfx=set)
    // and once from the explicit Set branch (mapper.py:441-460)
    assert(preds(d, "lux:setClassifiedAs") == Seq("aat:c1", "aat:c1"))
    assert(preds(d, "la:member_of") == Seq(I + "parent"))
    assert(preds(d, "lux:referenceClassifiedAs").isEmpty) // set pfx not in list
  }

  test("agent member_of uses the CRM membership predicate") {
    val d = MlMapper.transform(MlRecord(id = I + "x", rtype = "Group",
      member_of = Seq(I + "g2")))
    assert(preds(d, "crm:P107i_is_current_or_former_member_of") == Seq(I + "g2"))
  }

  test("unknown record type: no rdf:type triples, pfx 'other'") {
    val d = MlMapper.transform(MlRecord(id = I + "x", rtype = "Bogus",
      events = Map("produced_by" -> Event(carried_out_by = Seq(Ref(I + "a"))))))
    assert(preds(d, "rdf:type").isEmpty)
    assert(preds(d, "lux:otherAny") == Seq(I + "a"))
  }

  test("professional activity types exclude the active marker itself") {
    val rec = MlRecord(id = I + "x", rtype = "Person",
      events = Map("carried_out" -> Event(
        classified_as = Seq(MlMapper.ActiveMeta, "aat:job1", "aat:job2"))))
    val d = MlMapper.transform(rec)
    assert(preds(d, "lux:typeOfProfessionalActivity") ==
      Seq("aat:job1", "aat:job2"))
  }

  test("about via created_by.influenced_by expands to the full triple set") {
    // mapper.py:584-588: an about entry with no id contributes its
    // created_by.influenced_by refs exactly as direct about refs
    val rec = MlRecord(id = I + "x", rtype = "LinguisticObject",
      about = Seq(Ref(I + "direct", "Person")),
      about_influences = Seq(Ref(I + "via", "Place")))
    val d = MlMapper.transform(rec)
    assert(preds(d, "lux:about_or_depicts") == Seq(I + "direct", I + "via"))
    assert(preds(d, "crm:P129_is_about") == Seq(I + "direct", I + "via"))
    assert(preds(d, "lux:about_agent") == Seq(I + "direct"))
    assert(preds(d, "lux:about_place") == Seq(I + "via"))
    // both are real refs: lux:any, never refCtr
    assert(preds(d, "lux:any") == Seq(I + "direct", I + "via"))
    assert(preds(d, "lux:refCtr").isEmpty)
  }

  test("Set curation: used_for refs and curation-classified agents") {
    // mapper.py:486-505
    val rec = MlRecord(id = I + "x", rtype = "Set",
      used_for_refs = Seq(I + "exhibit"),
      events = Map("used_for" -> Event(
        classified_as = Seq(MlMapper.CurationMeta),
        carried_out_by = Seq(Ref(I + "curator")))))
    val d = MlMapper.transform(rec)
    assert(preds(d, "crm:P16i_was_used_for") == Seq(I + "exhibit"))
    assert(preds(d, "lux:agentOfCuration") == Seq(I + "curator"))
    // the embedded activity still walks as the used_for shortcut
    assert(preds(d, "lux:agentOfPublication") == Seq(I + "curator"))
    // a non-curation used_for event yields no curation triple
    val plain = MlMapper.transform(rec.copy(events = Map("used_for" ->
      Event(classified_as = Seq("aat:other"),
        carried_out_by = Seq(Ref(I + "curator"))))))
    assert(preds(plain, "lux:agentOfCuration").isEmpty)
  }

  test("event used_specific_object emits P16 and counts as a ref") {
    // mapper.py:722-730
    val rec = MlRecord(id = I + "y", rtype = "Activity",
      used_specific_object = Seq(I + "obj1", "http://ext/obj2"))
    val d = MlMapper.transform(rec)
    assert(preds(d, "crm:P16_used_specific_object") ==
      Seq(I + "obj1", "http://ext/obj2"))
    assert(preds(d, "lux:eventAny") == Seq(I + "obj1")) // internal only
    assert(preds(d, "lux:referenceAny") == Seq(I + "obj1")) // Activity in list
  }
}
