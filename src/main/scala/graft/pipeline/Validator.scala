package graft.pipeline

/** M16: schema validation — re-expression of
  * `pipeline/process/validator.py:40-80` as a declarative ruleset
  * (config-as-data) instead of jsonschema: per record class, required
  * properties and the allowed-property set (additionalProperties).
  * Faithful details: Material/Currency/Language/MeasurementUnit share
  * the Type schema (`:50-53`); underscore-prefixed extra properties are
  * tolerated when `underscoreOkay` (`:69-76`); a missing or unknown
  * class is fatal (`:58-63`).
  *
  * Pure per-record function — runs inside a map stage; the validation
  * sweep over 100 TB is shuffle-free.
  */
object Validator {

  final case class Schema(required: Set[String], allowed: Set[String])

  private val common = Set("id", "type", "_label", "identified_by",
    "referred_to_by", "equivalent", "classified_as", "attributed_by")

  val schemaMap: Map[String, Schema] = {
    val base = Map(
      "Person" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("born", "died", "carried_out", "residence",
          "contact_point", "exact_match")),
      "Group" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("formed_by", "dissolved_by", "carried_out", "residence")),
      "Place" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("defined_by", "part_of", "approximated_by")),
      "HumanMadeObject" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("produced_by", "encountered_by", "destroyed_by",
          "carries", "shows", "made_of", "dimension", "current_location",
          "member_of", "subject_of", "representation")),
      "LinguisticObject" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("created_by", "used_for", "about", "language",
          "part_of", "subject_of", "representation", "subject_to")),
      "VisualItem" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("created_by", "about", "represents", "subject_of",
          "representation", "subject_to")),
      "Set" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("created_by", "used_for", "about", "member_of",
          "members_exemplified_by")),
      "Type" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("broader", "created_by")),
      "Event" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("timespan", "took_place_at", "carried_out_by",
          "used_specific_object", "part_of")),
      "Activity" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("timespan", "took_place_at", "carried_out_by",
          "used_specific_object", "part_of")),
      "Period" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("timespan", "part_of")),
      "DigitalObject" -> Schema(Set("id", "type", "identified_by"),
        common ++ Set("created_by", "used_for", "access_point",
          "digitally_carries", "digitally_shows", "format")))
    // validator.py:50-53: concept subtypes share the Type schema
    base ++ Seq("Material", "Currency", "Language", "MeasurementUnit")
      .map(_ -> base("Type"))
  }

  /** Errors for one record given its class and present property names. */
  def validate(rtype: String, props: Seq[String],
      underscoreOkay: Boolean = true): Seq[String] = {
    if (rtype == null || rtype.isEmpty) return Seq("no_class")
    schemaMap.get(rtype) match {
      case None => Seq(s"unknown_class:$rtype")
      case Some(s) =>
        val present = props.toSet + "type"
        val missing = (s.required -- present).toSeq.sorted.map("missing:" + _)
        val extra = (present -- s.allowed)
          .filterNot(p => underscoreOkay && p.startsWith("_"))
          .toSeq.sorted.map("additional:" + _)
        missing ++ extra
    }
  }
}
