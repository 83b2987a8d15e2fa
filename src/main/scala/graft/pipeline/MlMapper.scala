package graft.pipeline

/** M14: the search-index mapper — shortcut triples, classification
  * triples, reference (`any`/`refCtr`) triples and facet booleans, a
  * re-expression of the reference's MlMapper.transform
  * (`pipeline/sources/lux/marklogic/mapper.py:195-847`) over a TYPED
  * record model instead of JSON walks.
  *
  * Everything here is a pure per-record function, designed to run inside
  * a `Dataset.map` stage (SURVEY §2.3): shuffle-free, embarrassingly
  * parallel — the index build over 100 TB is one map stage writing a
  * (subject, predicate, object) table that downstream LUX queries join
  * (bucketed by subject at scale, cf. LuxQueries.substrate).
  *
  * Deviations (documented):
  *   - namespaces are short prefixes (`lux:`, `crm:`, `la:`, `skos:`,
  *     `rdf:`) instead of full URIs — pure renaming;
  *   - TimeSpan epoch-second injection (mapper.py:85-97) lives in
  *     DateLib/LaMerge, not here.
  */
object MlMapper {

  /** Internal-URI marker: refs starting with this are "our" records
    * (reference: configs.internal_uri, mapper.py:77). */
  val InternalPfx = "https://lux.example/data/"

  /** Globals for the agent facet classifications (reference: the
    * configs.globals AAT terms, mapper.py:436-480). */
  val NationalityMeta = "aat:nationality"
  val OccupationMeta = "aat:occupation"
  val GenderMeta = "aat:gender"
  val ActiveMeta = "aat:active"
  /** globals["curation"] — the Set used_for classification that marks a
    * curating activity (mapper.py:495-505). */
  val CurationMeta = "aat:curation"

  /** mapper.py:790-805 — collection-site prefixes: access points here
    * mark collection items and do NOT count as "online". */
  val CollectionPrefixes: Seq[String] = Seq(
    "https://collections.britishart.",
    "https://artgallery.yale",
    "https://collections.peabody",
    "https://archives.yale.edu",
    "https://search.library.yale")
  private val OnlineExcludes: Seq[String] = Seq(
    "https://search.library.yale.edu/",
    "https://collections.britishart.yale.edu/",
    "https://artgallery.yale.edu/",
    "https://collections.peabody.yale.edu/",
    "https://archives.yale.edu/")

  // ------------------------------------------------------------- model

  /** A reference to another entity: id + (optional) its type. */
  final case class Ref(id: String, rtype: String = null)

  /** A classification with its own (meta-)classifications — supports the
    * nationality/occupation/gender facet walks (mapper.py:436-481). */
  final case class Cls(id: String, meta: Seq[String] = Nil)

  /** assigned sub-events inside attributed_by (mapper.py:368-390). */
  final case class Assigned(
      carried_out_by: Seq[Ref] = Nil,
      took_place_at: Seq[Ref] = Nil,
      technique: Seq[Ref] = Nil)
  final case class Attribution(assigned: Seq[Assigned] = Nil)

  /** One nested part of an event (mapper.py:335-390; parts don't nest). */
  final case class EventPart(
      carried_out_by: Seq[Ref] = Nil,
      took_place_at: Seq[Ref] = Nil,
      technique: Seq[Ref] = Nil,
      caused_by: Seq[Ref] = Nil,
      influenced_by: Seq[Ref] = Nil,
      attributed_by: Seq[Attribution] = Nil)

  /** An event node hanging off a shortcut property (mapper.py:261-270). */
  final case class Event(
      carried_out_by: Seq[Ref] = Nil,
      took_place_at: Seq[Ref] = Nil,
      technique: Seq[Ref] = Nil,
      caused_by: Seq[Ref] = Nil,
      influenced_by: Seq[Ref] = Nil,
      classified_as: Seq[String] = Nil,
      part: Seq[EventPart] = Nil,
      attributed_by: Seq[Attribution] = Nil)

  final case class DigRef(access_point: Seq[String] = Nil)
  final case class Representation(digitally_shown_by: Seq[DigRef] = Nil)
  final case class SubjectOf(digitally_carried_by: Seq[DigRef] = Nil)
  final case class Identifier(content: String)

  /** The typed record surface the index mapper consumes. `events` keys
    * are the source property names (produced_by, born, ...). */
  final case class MlRecord(
      id: String,
      rtype: String,
      classified_as: Seq[Cls] = Nil,
      identified_by: Seq[Identifier] = Nil,
      events: Map[String, Event] = Map.empty,
      member_of: Seq[String] = Nil,
      equivalent: Seq[String] = Nil,
      carries: Seq[String] = Nil,
      shows: Seq[String] = Nil,
      made_of: Seq[String] = Nil,
      digitally_carries: Seq[String] = Nil,
      digitally_shows: Seq[String] = Nil,
      about: Seq[Ref] = Nil,
      /** about entries with no id of their own, reachable only through
        * their created_by.influenced_by refs (mapper.py:584-588) —
        * expanded into the same triple set as direct about refs. */
      about_influences: Seq[Ref] = Nil,
      /** Set used_for entries that are plain references (mapper.py:
        * 486-494) — vs the embedded used_for Event in `events`. */
      used_for_refs: Seq[String] = Nil,
      used_specific_object: Seq[String] = Nil, // events, mapper.py:722-730
      represents: Seq[Ref] = Nil,
      language: Seq[String] = Nil,
      part_of: Seq[String] = Nil,
      broader: Seq[String] = Nil,
      carried_out_by: Seq[String] = Nil, // event-record level
      took_place_at: Seq[String] = Nil,  // event-record level
      access_point: Seq[String] = Nil,   // DigitalObject record level
      representation: Seq[Representation] = Nil,
      subject_of: Seq[SubjectOf] = Nil,
      subject_to_class: Seq[String] = Nil)

  final case class Triple(predicate: String, obj: String)

  final case class Facets(
      dataType: String,
      isCollectionItem: Int,
      hasDigitalImage: Int,
      isOnline: Int,
      isPublicDomain: Int)

  final case class MlDoc(id: String, triples: Seq[Triple], facets: Facets)

  // ------------------------------------------------------------- rules

  /** mapper.py:150-181 — record-type → index prefix. */
  def pfxOf(rtype: String): String = rtype match {
    case "VisualItem" | "LinguisticObject" => "work"
    case "HumanMadeObject" | "DigitalObject" => "item"
    case "Set" => "set"
    case "Person" | "Group" => "agent"
    case "Place" => "place"
    case "Type" | "Language" | "Material" | "Currency" | "MeasurementUnit" => "concept"
    case "Activity" | "Event" | "Period" => "event"
    case _ => "other"
  }

  /** mapper.py:202-220 — record-type → rdf:type objects. */
  val typeMap: Map[String, Seq[String]] = Map(
    "HumanMadeObject" -> Seq("crm:E22_Human-Made_Object", "lux:Item"),
    "DigitalObject" -> Seq("crm:D1_Digital_Object", "lux:Item"),
    "VisualItem" -> Seq("crm:E36_Visual_Item", "lux:Work"),
    "LinguisticObject" -> Seq("crm:E33_Linguistic_Object", "lux:Work"),
    "Set" -> Seq("la:Set"),
    "Person" -> Seq("crm:E21_Person", "lux:Agent"),
    "Group" -> Seq("crm:E74_Group", "lux:Agent"),
    "Place" -> Seq("crm:E53_Place"),
    "Type" -> Seq("crm:E55_Type", "lux:Concept"),
    "Material" -> Seq("crm:E57_Material", "lux:Concept"),
    "Language" -> Seq("crm:E56_Language", "lux:Concept"),
    "Unit" -> Seq("crm:E58_Measurement_Unit", "lux:Concept"),
    "MeasurementUnit" -> Seq("crm:E58_Measurement_Unit", "lux:Concept"),
    "Event" -> Seq("crm:E5_Event", "lux:Event"),
    "Activity" -> Seq("crm:E7_Activity", "lux:Event"),
    "Period" -> Seq("crm:E4_Period", "lux:Event"))

  /** mapper.py:262-271 — shortcut source property → predicate class. */
  val shortcuts: Seq[(String, String)] = Seq(
    "produced_by" -> "Production",
    "created_by" -> "Creation",
    "born" -> "Beginning",
    "died" -> "Ending",
    "formed_by" -> "Beginning",
    "dissolved_by" -> "Ending",
    "used_for" -> "Publication",
    "encountered_by" -> "Encounter",
    "carried_out" -> "Activity")

  /** mapper.py:751-759 — types whose `any` refs also get referenceAny. */
  private val refAnyTypes = Set("Group", "Person", "Place", "Activity",
    "Period", "Type", "Language", "MeasurementUnit")

  /** The full index transform: one record → triples + facets.
    * `refCtrExcludes`: ids never counted in refCtr (the globals + top-20
    * exclusion list, mapper.py:47-71). */
  def transform(rec: MlRecord,
      refCtrExcludes: Set[String] = Set.empty): MlDoc = {
    val me = rec.id
    val pfx = pfxOf(rec.rtype)
    val ts = Seq.newBuilder[Triple]

    // rdf:type (mapper.py:254-259)
    typeMap.getOrElse(rec.rtype, Nil).foreach(t => ts += Triple("rdf:type", t))

    // shortcut walks (mapper.py:297-430)
    for ((prop, predClass) <- shortcuts; ev <- rec.events.get(prop)) {
      val agents = Seq.newBuilder[String]
      val places = Seq.newBuilder[String]
      val techs = Seq.newBuilder[String]
      val causes = Seq.newBuilder[String]
      def addAssigned(a: Assigned): Unit = {
        agents ++= a.carried_out_by.map(_.id)
        places ++= a.took_place_at.map(_.id)
        techs ++= a.technique.map(_.id)
      }
      def addInfluence(inf: Ref): Unit = {
        val infpfx = Option(inf.rtype).map(pfxOf).getOrElse("other")
        ts += Triple(s"lux:${infpfx}Influenced$predClass", inf.id)
      }
      agents ++= ev.carried_out_by.map(_.id)
      places ++= ev.took_place_at.map(_.id)
      techs ++= ev.technique.map(_.id)
      causes ++= ev.caused_by.map(_.id)
      ev.influenced_by.foreach(addInfluence)
      for (p <- ev.part) {
        agents ++= p.carried_out_by.map(_.id)
        places ++= p.took_place_at.map(_.id)
        techs ++= p.technique.map(_.id)
        causes ++= p.caused_by.map(_.id)
        p.influenced_by.foreach(addInfluence)
        p.attributed_by.flatMap(_.assigned).foreach(addAssigned)
      }
      ev.attributed_by.flatMap(_.assigned).foreach(addAssigned)
      agents.result().foreach(a => ts += Triple(s"lux:agentOf$predClass", a))
      places.result().foreach(p => ts += Triple(s"lux:placeOf$predClass", p))
      techs.result().foreach(t => ts += Triple(s"lux:techniqueOf$predClass", t))
      causes.result().foreach(c => ts += Triple(s"lux:causeOf$predClass", c))
    }

    // classified_as (mapper.py:434-460)
    val cxns = rec.classified_as.map(_.id)
    for (c <- cxns) {
      ts += Triple("crm:P2_has_type", c)
      ts += Triple(s"lux:${pfx}ClassifiedAs", c)
      if (Set("agent", "place", "concept", "event")(pfx))
        ts += Triple("lux:referenceClassifiedAs", c)
      if (rec.rtype == "Set")
        ts += Triple("lux:setClassifiedAs", c)
    }

    // member_of (mapper.py:461-470)
    val memberPred =
      if (pfx == "agent") "crm:P107i_is_current_or_former_member_of"
      else "la:member_of"
    rec.member_of.foreach(m => ts += Triple(memberPred, m))

    // equivalent (mapper.py:471-479)
    rec.equivalent.foreach(eq => ts += Triple("la:equivalent", eq))

    // agent facets: nationality / occupation; person gender
    // (mapper.py:436-484)
    if (pfx == "agent") {
      rec.classified_as.filter(_.meta.contains(NationalityMeta))
        .foreach(c => ts += Triple("lux:agentNationality", c.id))
      rec.classified_as.filter(_.meta.contains(OccupationMeta))
        .foreach(c => ts += Triple("lux:agentOccupation", c.id))
      // typeOfProfessionalActivity: active-classified carried_out
      // (mapper.py:485-499)
      for (co <- rec.events.get("carried_out").toSeq
           if co.classified_as.contains(ActiveMeta);
           cx <- co.classified_as if cx != ActiveMeta)
        ts += Triple("lux:typeOfProfessionalActivity", cx)
    }
    if (rec.rtype == "Person")
      rec.classified_as.filter(_.meta.contains(GenderMeta))
        .foreach(c => ts += Triple("lux:agentGender", c.id))

    // class-specific triples (mapper.py:507-754)
    rec.rtype match {
      case "HumanMadeObject" =>
        rec.carries.foreach { c =>
          ts += Triple("lux:carries_or_shows", c)
          ts += Triple("crm:P128_carries", c)
        }
        rec.shows.foreach { s =>
          ts += Triple("lux:carries_or_shows", s)
          ts += Triple("crm:P65_shows_visual_item", s)
        }
        rec.made_of.foreach(m => ts += Triple("crm:P45_consists_of", m))
      case "DigitalObject" =>
        rec.digitally_carries.foreach { c =>
          ts += Triple("lux:carries_or_shows", c)
          ts += Triple("la:digitally_carries", c)
        }
        rec.digitally_shows.foreach { s =>
          ts += Triple("lux:carries_or_shows", s)
          ts += Triple("la:digitally_shows", s)
        }
      case "LinguisticObject" | "Set" =>
        // Set curation (mapper.py:485-505): plain used_for references,
        // and the curation-classified embedded activity's agents
        if (rec.rtype == "Set") {
          rec.used_for_refs.foreach(uf =>
            ts += Triple("crm:P16i_was_used_for", uf))
          for (uf <- rec.events.get("used_for").toSeq
               if uf.classified_as.contains(CurationMeta);
               who <- uf.carried_out_by)
            ts += Triple("lux:agentOfCuration", who.id)
        }
        // about with id, plus entries reachable only via
        // created_by.influenced_by (mapper.py:582-600) — same triple set
        (rec.about ++ rec.about_influences).foreach { a =>
          ts += Triple("lux:about_or_depicts", a.id)
          ts += Triple("crm:P129_is_about", a.id)
          Option(a.rtype).map(pfxOf).foreach { apfx =>
            ts += Triple(s"lux:about_or_depicts_$apfx", a.id)
            ts += Triple(s"lux:about_$apfx", a.id)
          }
        }
        rec.language.foreach { l =>
          ts += Triple("crm:P72_has_language", l)
          ts += Triple(s"lux:${pfx}Language", l)
        }
        rec.part_of.foreach(w => ts += Triple("crm:P106i_forms_part_of", w))
      case "VisualItem" =>
        rec.about.foreach { a =>
          ts += Triple("lux:about_or_depicts", a.id)
          ts += Triple("crm:P129_is_about", a.id)
          Option(a.rtype).map(pfxOf).foreach { apfx =>
            ts += Triple(s"lux:about_or_depicts_$apfx", a.id)
            ts += Triple(s"lux:about_$apfx", a.id)
          }
        }
        rec.represents.foreach { r =>
          ts += Triple("lux:about_or_depicts", r.id)
          ts += Triple("crm:P138_represents", r.id)
          Option(r.rtype).map(pfxOf).foreach { rpfx =>
            ts += Triple(s"lux:about_or_depicts_$rpfx", r.id)
            ts += Triple(s"lux:depicts_$rpfx", r.id)
          }
        }
      case "Place" =>
        rec.part_of.foreach(p => ts += Triple("crm:P89_falls_within", p))
      case _ if pfx == "event" =>
        rec.carried_out_by.foreach(a => ts += Triple(s"lux:${pfx}CarriedOutBy", a))
        rec.took_place_at.foreach(p => ts += Triple(s"lux:${pfx}TookPlaceAt", p))
        rec.used_specific_object.foreach(u => // mapper.py:722-730
          ts += Triple("crm:P16_used_specific_object", u))
      case _ if pfx == "concept" =>
        rec.broader.foreach(b => ts += Triple("skos:broader", b))
      case _ => ()
    }

    // reference triples: any / referenceAny / refCtr (mapper.py:746-784)
    val (reffed, allReffed) = namedRefs(rec)
    for (r <- reffed) {
      ts += Triple(s"lux:${pfx}Any", r)
      ts += Triple("lux:any", r)
      if (refAnyTypes(rec.rtype)) ts += Triple("lux:referenceAny", r)
    }
    val reffedSet = reffed.toSet
    for (r <- allReffed
         if !refCtrExcludes(r) && !reffedSet(r))
      ts += Triple("lux:refCtr", r)

    MlDoc(me, ts.result(), facetsOf(rec))
  }

  /** The named-refs walk (mapper.py:77-136) over the typed model:
    * `refs` = internal ids reachable outside ignore_props (feeds
    * lux:any), `allRefs` = every internal id (feeds refCtr). Both
    * first-appearance-ordered and deduped, like the list-append walk.
    * Ignored subtrees in this model: technique, attributed_by (and its
    * assigned), equivalent, identified_by, subject_of, access_point,
    * language, digitally_carries/shows, subject_to. */
  def namedRefs(rec: MlRecord): (Seq[String], Seq[String]) = {
    val refs = scala.collection.mutable.LinkedHashSet[String]()
    val all = scala.collection.mutable.LinkedHashSet[String]()
    def add(id: String, ignored: Boolean): Unit =
      if (id != null && id.startsWith(InternalPfx)) {
        all += id
        if (!ignored) refs += id
      }
    // shortcut order, not Map order: keeps the walk deterministic
    for ((prop, _) <- shortcuts; ev <- rec.events.get(prop)) {
      ev.carried_out_by.foreach(r => add(r.id, false))
      ev.took_place_at.foreach(r => add(r.id, false))
      ev.technique.foreach(r => add(r.id, true))
      ev.caused_by.foreach(r => add(r.id, false))
      ev.influenced_by.foreach(r => add(r.id, false))
      for (p <- ev.part) {
        p.carried_out_by.foreach(r => add(r.id, false))
        p.took_place_at.foreach(r => add(r.id, false))
        p.technique.foreach(r => add(r.id, true))
        p.caused_by.foreach(r => add(r.id, false))
        p.influenced_by.foreach(r => add(r.id, false))
        p.attributed_by.flatMap(_.assigned).foreach { a =>
          a.carried_out_by.foreach(r => add(r.id, true))
          a.took_place_at.foreach(r => add(r.id, true))
          a.technique.foreach(r => add(r.id, true))
        }
      }
      ev.attributed_by.flatMap(_.assigned).foreach { a =>
        a.carried_out_by.foreach(r => add(r.id, true))
        a.took_place_at.foreach(r => add(r.id, true))
        a.technique.foreach(r => add(r.id, true))
      }
    }
    rec.classified_as.foreach(c => add(c.id, false))
    rec.member_of.foreach(add(_, false))
    rec.equivalent.foreach(add(_, true))
    rec.carries.foreach(add(_, false))
    rec.shows.foreach(add(_, false))
    rec.made_of.foreach(add(_, false))
    rec.digitally_carries.foreach(add(_, true))
    rec.digitally_shows.foreach(add(_, true))
    rec.about.foreach(r => add(r.id, false))
    rec.about_influences.foreach(r => add(r.id, false))
    rec.used_for_refs.foreach(add(_, false))
    rec.used_specific_object.foreach(add(_, false))
    rec.represents.foreach(r => add(r.id, false))
    rec.language.foreach(add(_, true))
    rec.part_of.foreach(add(_, false))
    rec.broader.foreach(add(_, false))
    rec.carried_out_by.foreach(add(_, false))
    rec.took_place_at.foreach(add(_, false))
    (refs.toSeq, all.toSeq)
  }

  /** Facet booleans (mapper.py:239-252 + 786-834). */
  def facetsOf(rec: MlRecord): Facets = {
    val pfx = pfxOf(rec.rtype)

    // MFHDs are never collection items (mapper.py:275-281)
    val isMFHD = rec.identified_by.exists(i =>
      i.content != null && i.content.startsWith("ils:yul:mfhd:"))
    // FIRST access point of each digital carrier decides (mapper.py:283-297)
    val collectionItem = !isMFHD && rec.subject_of.exists(
      _.digitally_carried_by.exists(_.access_point.headOption.exists(ap =>
        CollectionPrefixes.exists(ap.startsWith))))

    val hasImage = rec.representation.exists(
      _.digitally_shown_by.exists(_.access_point.nonEmpty))

    var online = 0
    if (pfx == "item" || pfx == "work") {
      if (hasImage) online = 1
      if (rec.rtype == "DigitalObject" && rec.access_point.nonEmpty) online = 1
      // ANY non-collection access point counts (mapper.py:806-823)
      if (rec.subject_of.exists(_.digitally_carried_by.exists(
          _.access_point.exists(ap =>
            ap.nonEmpty && !OnlineExcludes.exists(ap.startsWith)))))
        online = 1
    }

    val pd = pfx == "work" &&
      rec.subject_to_class.exists(_.contains("creativecommons.org/publicdomain"))

    Facets(rec.rtype, if (collectionItem) 1 else 0, if (hasImage) 1 else 0,
      online, if (pd) 1 else 0)
  }
}
