package graft.pipeline

import org.json4s._

/** M15: the N-Triples record walk — re-expression of the Qlever mapper's
  * `walk_for_triples` (`pipeline/sources/lux/qlever/mapper.py:210-379`):
  * a whole nested record serializes to (subject, predicate, object)
  * rows, with
  *
  *   - bnode minting `{base}_{n}` for id-less nested nodes (`:211-214`);
  *   - internal-reference short-circuit: a nested node with its own
  *     internal id contributes ONE reference triple — its content comes
  *     from its own record (`:216-222`), refs collected for the link
  *     table;
  *   - external-URI sanitization (spaces/quotes/newlines, `{}`→%7B/%7D,
  *     `:224-232`);
  *   - the ~60-entry property→predicate map (`:43-208`) with the
  *     type-dependent part/part_of (`:246-291`) and member_of
  *     (`:294-308`) resolutions;
  *   - literal handling: content/format/defined_by as escaped string
  *     literals, `value` as a bare numeric literal, the four timespan
  *     props as xsd:dateTime literals, `type` through the class map
  *     (`:317-356`).
  *
  * Pure per-record function over the record's JSON (json4s, shipped
  * with Spark) for a map stage: serializing 100 TB of records to
  * triples is shuffle-free. Namespaces are short prefixes like
  * MlMapper (pure renaming, documented there). Kind column instead of
  * inline N3 quoting ("uri" | "literal" | "date"); the NT text
  * rendering is a trivial format step (spec'd). */
object NtWalk {

  final case class Nt(subject: String, predicate: String, obj: String,
      kind: String)

  val typeMap: Map[String, String] = Map(
    "HumanMadeObject" -> "crm:E22_Human-Made_Object",
    "DigitalObject" -> "dig:D1_Digital_Object",
    "VisualItem" -> "crm:E36_Visual_Item",
    "LinguisticObject" -> "crm:E33_Linguistic_Object",
    "Set" -> "la:Set", "Person" -> "crm:E21_Person",
    "Group" -> "crm:E74_Group", "Place" -> "crm:E53_Place",
    "Type" -> "crm:E55_Type", "Material" -> "crm:E57_Material",
    "Language" -> "crm:E56_Language",
    "MeasurementUnit" -> "crm:E58_Measurement_Unit",
    "Currency" -> "crm:E98_Currency", "Event" -> "crm:E5_Event",
    "Activity" -> "crm:E7_Activity", "Period" -> "crm:E4_Period",
    "Production" -> "crm:E12_Production",
    "AttributeAssignment" -> "crm:E13_Attribute_Assignment",
    "Right" -> "crm:E30_Right", "Identifier" -> "crm:E42_Identifier",
    "TimeSpan" -> "crm:E52_Time-Span", "Dimension" -> "crm:E54_Dimension",
    "Creation" -> "crm:E65_Creation", "Formation" -> "crm:E66_Formation",
    "Birth" -> "crm:E67_Birth", "Dissolution" -> "crm:E68_Dissolution",
    "Death" -> "crm:E69_Death",
    "InformationObject" -> "crm:E73_Information_Object",
    "Name" -> "crm:E33_E41_Linguistic_Appellation",
    "DigitalService" -> "la:DigitalService", "Encounter" -> "sci:S19_Encounter")

  val propMap: Map[String, String] = Map(
    "identified_by" -> "crm:P1_is_identified_by",
    "classified_as" -> "crm:P2_has_type",
    "timespan" -> "crm:P4_has_time-span",
    "took_place_at" -> "crm:P7_took_place_at",
    "carried_out_by" -> "crm:P14_carried_out_by",
    "carried_out" -> "crm:P14i_performed",
    "influenced_by" -> "crm:P15_was_influenced_by",
    "used_specific_object" -> "crm:P16_used_specific_object",
    "used_for" -> "crm:P16i_was_used_for",
    "referred_to_by" -> "crm:P67i_is_referred_to_by",
    "equivalent" -> "la:equivalent",
    "representation" -> "crm:P138i_has_representation",
    "subject_of" -> "crm:P129i_is_subject_of",
    "attributed_by" -> "crm:P140i_was_attributed_by",
    "broader" -> "skos:broader",
    "created_by" -> "crm:P94i_was_created_by",
    "technique" -> "crm:P32_used_general_technique",
    "about" -> "crm:P129_is_about",
    "assigned" -> "crm:P141_assigned",
    "language" -> "crm:P72_has_language",
    "unit" -> "crm:P91_has_unit",
    "made_of" -> "crm:P45_consists_of",
    "dimension" -> "crm:P43_has_dimension",
    "format" -> "dc:format",
    "digitally_carries" -> "la:digitally_carries",
    "digitally_shows" -> "la:digitally_shows",
    "access_point" -> "la:access_point",
    "caused_by" -> "sci:O13i_is_triggered_by",
    "participated_in" -> "crm:P11i_participated_in",
    "residence" -> "crm:P74_has_current_or_former_residence",
    "formed_by" -> "crm:P95i_was_formed_by",
    "dissolved_by" -> "crm:P99i_was_dissolved_by",
    "born" -> "crm:P98i_was_born", "died" -> "crm:P100i_died_in",
    "current_location" -> "crm:P55_has_current_location",
    "carries" -> "crm:P128_carries",
    "shows" -> "crm:P65_shows_visual_item",
    "produced_by" -> "crm:P108i_was_produced_by",
    "destroyed_by" -> "crm:P13i_was_destroyed_by",
    "encountered_by" -> "sci:O19i_was_object_encountered_at",
    "defined_by" -> "crm:P168_place_is_defined_by",
    "content" -> "crm:P190_has_symbolic_content",
    "represents" -> "crm:P138_represents",
    "digitally_shown_by" -> "la:digitally_shown_by",
    "digitally_carried_by" -> "la:digitally_carried_by",
    "begin_of_the_begin" -> "crm:P82a_begin_of_the_begin",
    "end_of_the_end" -> "crm:P82b_end_of_the_end",
    "begin_of_the_end" -> "crm:P81b_begin_of_the_end",
    "end_of_the_begin" -> "crm:P81a_end_of_the_begin",
    "value" -> "crm:P90_has_value",
    "subject_to" -> "crm:P104_is_subject_to",
    "type" -> "rdf:type")

  private val ignoreForRefs = Set("identified_by", "referred_to_by",
    "equivalent", "access_point", "dimension", "subject_of",
    "attributed_by", "contact_point", "defined_by", "approximated_by",
    "language", "technique", "digitally_carries", "subject_to",
    "assigned_by", "exemplary_member_of")

  private val dateProps = Set("begin_of_the_begin", "end_of_the_end",
    "begin_of_the_end", "end_of_the_begin")
  private val stringLiteralProps = Set("content", "format", "defined_by")

  /** part/part_of predicate by the node's own class (qlever:246-291). */
  private[graft] def partPred(mytype: String, k: String): String = mytype match {
    case "LinguisticObject" | "VisualItem" | "DigitalObject" | "Name" |
         "Identifier" | "InformationObject" =>
      if (k == "part") "crm:P106_is_composed_of" else "crm:P106i_forms_part_of"
    case "Production" | "Creation" | "Formation" | "Dissolution" | "Event" |
         "Activity" | "Period" | "AttributeAssignment" =>
      if (k == "part") "crm:P9_consists_of" else "crm:P9i_forms_part_of"
    case "HumanMadeObject" =>
      if (k == "part") "crm:P46_is_composed_of" else "crm:P46i_forms_part_of"
    case "Place" =>
      if (k == "part") "crm:P89i_contains" else "crm:P89_falls_within"
    case "Type" | "Currency" | "MeasurementUnit" | "Material" | "Language" =>
      if (k == "part") "skos:broader" else "skos:narrower"
    case _ => s"lux:$k"
  }

  private def sanitize(uri: String): String =
    uri.replace(" ", "%20").replace("\n", "").replace("\t", "")
      .replace("\r", "").replace("\"", "")
      .replace("{", "%7B").replace("}", "%7D")

  private final class Conf(val base: String) {
    var bid = 0
    val triples = Seq.newBuilder[Nt]
    val refs = scala.collection.mutable.LinkedHashSet[String]()
  }

  /** Walk one record's JSON → its triple rows + collected internal refs.
    * Malformed records (unparseable JSON, non-object roots, missing id)
    * yield an EMPTY triple set instead of throwing: inside a flatMap over
    * a large corpus one bad record must not fail the stage — the
    * reference logs and skips comparable bad input. */
  def transform(json: String,
      internalPfx: String = MlMapper.InternalPfx): (Seq[Nt], Seq[String]) = {
    val rootOpt =
      try org.json4s.jackson.JsonMethods.parse(json) match {
        case o: JObject => Some(o)
        case _ => None
      } catch { case _: Exception => None }
    (for {
      root <- rootOpt
      base <- root.obj.collectFirst { case ("id", JString(s)) => s }
    } yield {
      val conf = new Conf(base)
      walk(root, conf, internalPfx, ignore = false)
      (conf.triples.result(), conf.refs.toSeq)
    }).getOrElse((Nil, Nil))
  }

  private def walk(node: JObject, conf: Conf, pfx: String,
      ignore: Boolean): Option[String] = {
    val fields = node.obj
    val idOpt = fields.collectFirst { case ("id", JString(s)) => s }
    val me = idOpt match {
      case None =>
        val b = s"${conf.base}_${conf.bid}"; conf.bid += 1; b
      case Some(id) if id != conf.base && id.startsWith(pfx) =>
        if (!ignore) conf.refs += id
        return Some(id) // its triples come from its own record
      case Some(id) if !id.startsWith(pfx) => sanitize(id)
      case Some(id) => id
    }
    val myType = fields.collectFirst { case ("type", JString(t)) => t }

    for ((k, v) <- fields if k != "id" && k != "_label" && k != "@context") {
      val pred: Option[String] = k match {
        case "part" | "part_of" =>
          Some(partPred(myType.getOrElse(""), k))
        case "member_of" =>
          val objType = v match {
            case JArray((o: JObject) :: _) =>
              o.obj.collectFirst { case ("type", JString(t)) => t }
            case _ => None
          }
          objType match {
            case Some("Set") => Some("la:member_of")
            case Some("Group") => Some("crm:P107i_is_current_or_former_member_of")
            case Some(_) => Some("la:member_of")
            case None =>
              if (myType.exists(Set("Person", "Group")))
                Some("crm:P107i_is_current_or_former_member_of")
              else Some("la:member_of")
          }
        case _ => Option(propMap.getOrElse(k, null))
      }
      pred match {
        case None => () // unknown property: skipped (reference logs)
        case Some(p) =>
          val childIgnore = ignore || ignoreForRefs(k)
          v match {
            case JString(t) if k == "type" =>
              // class through the type map; unknown class skipped
              typeMap.get(t).foreach(o => conf.triples += Nt(me, p, o, "uri"))
            case JString(s) if stringLiteralProps(k) =>
              conf.triples += Nt(me, p,
                s.replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r"),
                "literal")
            case JString(s) if dateProps(k) =>
              conf.triples += Nt(me, p, s, "date")
            case JInt(n) if k == "value" =>
              conf.triples += Nt(me, p, n.toString, "literal")
            case JDouble(d) if k == "value" =>
              conf.triples += Nt(me, p, d.toString, "literal")
            case JString(s) if k == "access_point" =>
              conf.triples += Nt(me, p, s, "uri")
            case JArray(items) =>
              items.foreach {
                case o: JObject =>
                  walk(o, conf, pfx, childIgnore)
                    .foreach(obj => conf.triples += Nt(me, p, obj, "uri"))
                case _ => () // non-dict in list: reference logs + skips
              }
            case o: JObject =>
              walk(o, conf, pfx, childIgnore)
                .foreach(obj => conf.triples += Nt(me, p, obj, "uri"))
            case _ => () // unhandled literal type: reference logs + skips
          }
      }
    }
    Some(me)
  }

  /** NT text rendering of one row (the triple/literal_pattern strings,
    * qlever:80-83, with short prefixes). */
  def render(t: Nt): String = t.kind match {
    case "uri" => s"<${t.subject}> <${t.predicate}> <${t.obj}> ."
    case "date" =>
      s"""<${t.subject}> <${t.predicate}> "${t.obj}"^^<http://www.w3.org/2001/XMLSchema#dateTime> ."""
    case _ => s"""<${t.subject}> <${t.predicate}> "${t.obj}" ."""
  }
}
