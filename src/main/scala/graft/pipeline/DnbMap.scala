package graft.pipeline

import graft.functions.DateLib

/** DNB (Deutsche Nationalbibliothek / GND) mapper core — exemplar port
  * of `pipeline/sources/libraries/dnb/mapper.py` (528 LoC, the largest
  * mapper that previously had only its LOADER covered):
  *
  *   - entity-graph guess_type (`:279-296`): person → Person,
  *     organization/organisation → Group classified Organization,
  *     family → Group classified Family, place → Place,
  *     event → Event, anything else unmapped;
  *   - sachbegriff guess_lds_type (`:301-313`): the record's @type
  *     LIST is scanned in order and each entry matches by URI SUFFIX —
  *     SubjectHeadingSensoStricto/SubjectHeading/
  *     NomenclatureInBiologyOrChemistry → Type, Language → Language,
  *     EthnographicName → Group; the first match returns;
  *   - two-digit century completion (`:83-86`, `:223-226`): a
  *     two-character dateOfDeath (or dateOfTermination) is completed
  *     with the CENTURY DIGITS of the birth (establishment) date —
  *     dob "1871", dod "99" → "1899";
  *   - periodOfActivity (`:112-135`): processed only when a dash
  *     appears PAST the first character (a leading minus alone never
  *     splits); a value with more than one interior dash aborts; both
  *     halves must parse or no activity is emitted;
  *   - homepage self-link skip (`:345-352`, `:467-471`): the record
  *     number (last path segment of the record id) appearing ANYWHERE
  *     among the homepage URL's path segments drops the link;
  *   - depiction URL repair (`:484-489`): literal spaces AND the
  *     percent-encoded form both become underscores;
  *   - gender (`:149-157`): only the GND male/female vocabulary URIs
  *     classify; anything else is IGNORED (no passthrough — unlike
  *     BNE);
  *   - macs.nt sidecar (`:20-43`): closeMatch lines keyed by the GND
  *     id (the `<...>`-stripped last path segment), target the bare
  *     object URI;
  *   - lds record election (`:316-321`): the FIRST @graph list entry
  *     whose id does not end in `/about`;
  *   - lds broader terms (`:388-391`): four broader predicates, but
  *     only Type and Language records take them;
  *   - preferredName is honored only when it is a plain STRING
  *     (`:443-446` — a list silently skips both the label and the
  *     primary name).
  *
  * Pure per-record functions for a `Dataset.map` stage. */
object DnbMap {

  /** entity-graph guess_type → (top class, group sub-classification). */
  def guessType(typ: String): Option[(String, String)] = typ match {
    case "person" => Some(("Person", ""))
    case "organization" | "organisation" => Some(("Group", "Organization"))
    case "family" => Some(("Group", "Family"))
    case "place" => Some(("Place", ""))
    case "event" => Some(("Event", ""))
    case _ => None
  }

  /** sachbegriff guess_lds_type: first suffix match in list order. */
  def guessLdsType(types: Seq[String]): Option[String] = types.collectFirst {
    case t if t.endsWith("SubjectHeadingSensoStricto") => "Type"
    case t if t.endsWith("Language") => "Language"
    case t if t.endsWith("SubjectHeading") => "Type"
    case t if t.endsWith("EthnographicName") => "Group"
    case t if t.endsWith("NomenclatureInBiologyOrChemistry") => "Type"
  }

  /** Two-digit death/termination dates complete with the birth/
    * establishment century (`:83-86`). */
  def centuryComplete(dob: String, dod: String): String =
    if (dob.nonEmpty && dod.length == 2) dob.take(2) + dod else dod

  /** periodOfActivity → (begin, end) spans; the dash gate skips the
    * first character, a multi-dash value aborts, both halves must
    * parse (`:112-135`). */
  def activityRange(doa: String): Option[(String, String)] = {
    if (doa.length < 2 || !doa.substring(1).contains("-")) return None
    val parts = doa.split("-", -1)
    if (parts.length != 2) return None
    for {
      b <- DateLib.makeDatetime(parts(0))
      e <- DateLib.makeDatetime(parts(1))
    } yield (b.begin, e.end)
  }

  /** Homepage self-link skip (`:467-471`): true = keep the link. */
  def keepHomepage(recId: String, homepage: String): Boolean = {
    val recNumber = recId.split("/").last
    !homepage.split("/").contains(recNumber)
  }

  /** Depiction URL repair (`:484-489`). */
  def depictionUri(jpg: String): String =
    jpg.replace(" ", "_").replace("%20", "_")

  /** GND gender classification: male/female only, others IGNORED. */
  def gender(uri: String): Option[String] = uri match {
    case "https://d-nb.info/standards/vocab/gnd/gender#male" => Some("male")
    case "https://d-nb.info/standards/vocab/gnd/gender#female" => Some("female")
    case _ => None
  }

  /** macs.nt closeMatch line → (gnd id, target uri) (`:29-38`). */
  def macsLine(line: String): Option[(String, String)] = {
    val l = line.trim
    if (!l.startsWith("<https://d-nb.info/gnd/") || !l.contains("closeMatch"))
      None
    else {
      val parts = l.replace(" .", "").split(" ")
      if (parts.length != 3) None
      else {
        val a = parts(0); val c = parts(2)
        val gnd = a.split("/").last.dropRight(1) // strip the trailing '>'
        Some((gnd, c.substring(1, c.length - 1)))
      }
    }
  }

  /** lds record election: first id not ending in /about (`:316-321`). */
  def ldsElect(ids: Seq[String]): Option[String] =
    ids.find(i => i.nonEmpty && !i.endsWith("/about"))

  /** lds broader terms land only on Type/Language records (`:388-391`). */
  def takesBroader(topcls: String): Boolean =
    topcls == "Type" || topcls == "Language"

  /** preferredName only when a plain string — a list yields nothing
    * (`:443-446`). */
  def preferredName(pn: Either[Seq[String], String]): Option[String] =
    pn.toOption
}
