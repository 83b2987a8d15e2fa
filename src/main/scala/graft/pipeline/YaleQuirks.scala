package graft.pipeline

/** The Yale unit mappers not yet exemplar-covered — YPM (Peabody,
  * `yale/ypm/mapper.py`, 118 LoC), YUAG (Art Gallery,
  * `yale/yuag/mapper.py`, 162 LoC) and PMC (Paul Mellon Centre,
  * `yale/pmc/mapper.py`, 44 LoC) — as pure per-record kernels.
  * IPCH (`yale/ipch/mapper.py`) and Arches (`yale/arches/mapper.py`)
  * are identity transforms (should_merge always true, transform
  * returns the record untouched) — nothing to port.
  *
  * YPM quirks:
  *   - Species classifications with an EMPTY id get the wikidata
  *     species entity filled in — first match only, the loop breaks
  *     (`:17-22`); note the reference writes `https://www.wikidata...`
  *     here where gbif uses `http://` — both kept verbatim;
  *   - "[no locality data]" primary-name swap (`:24-40`): the scan
  *     remembers the LAST no-locality primary, stops at the FIRST
  *     other classified name, and only swaps when the primary was
  *     seen (in list order) — the alternate's content moves into the
  *     primary and the alternate is removed;
  *   - defined_by survives only when it starts with POLYGON or POINT
  *     after trimming (`:86-90`);
  *   - Collection Item (`:94-115`): HMOs whose Identifier carries an
  *     accession/catalog classification (three AAT ids) get the
  *     Collection Item class appended.
  *
  * YUAG quirks:
  *   - formed_by/dissolved_by lists collapse to their first element
  *     (`:21-24`);
  *   - a Group with born/died retypes to Person, equivalents follow
  *     (`:26-31`);
  *   - identified_by repair (`:59-76`): ids dropped, the bogus
  *     "Primary Name" type becomes Name + the primary-name
  *     classification, non-string content is stringified, content-less
  *     entries are removed;
  *   - Activity fixes (`:80-101`): a missing timespan hoists from
  *     part_of[0] (and deletes part_of); took_place_at entries whose
  *     id contains `/agt/` are actually carried_out_by Groups, the
  *     rest retype to Place; an emptied took_place_at is deleted;
  *   - Collection Item: same append as YPM but gated on the single
  *     accession AAT id and WITHOUT the HMO type check (`:139-158`).
  *
  * PMC quirks:
  *   - Group part_of renames to member_of (`:14-16`);
  *   - a Set classified as BOTH archive and collection drops the
  *     collection class (`:18-25`);
  *   - referred_to_by notes carrying any of three internal note
  *     classes are purged (`:27-40`).
  */
object YaleQuirks {

  private val CollectionItem = "http://vocab.getty.edu/aat/300404024"
  private val PrimaryName = "http://vocab.getty.edu/aat/300404670"

  // ------------------------------------------------------------- YPM

  /** (id, label) classifications; first empty-id Species gets the
    * wikidata entity (https — verbatim from `:20`), then the loop
    * breaks. */
  def ypmSpeciesFill(recType: String,
      cxns: Seq[(String, String)]): Seq[(String, String)] = {
    if (recType != "Type") cxns
    else {
      val i = cxns.indexWhere { case (id, label) =>
        id.isEmpty && label == "Species" }
      if (i < 0) cxns
      else cxns.updated(i, ("https://www.wikidata.org/entity/Q7432", "Species"))
    }
  }

  /** A name row: content + its classification ids (empty = the
    * reference's names without classified_as, which the scan skips). */
  final case class YpmName(content: String, classifiedAs: Seq[String])

  /** The no-locality swap (`:24-40`): scan classified names in order —
    * a "[no locality data]" primary is remembered (last wins), the
    * first OTHER name stops the scan. Swap only when the primary was
    * found before the alternate. */
  def ypmNoLocalitySwap(recType: String, names: Seq[YpmName]): Seq[YpmName] = {
    if (recType != "Place") return names
    var p = -1; var alt = -1
    var i = 0
    while (i < names.length && alt < 0) {
      val n = names(i)
      if (n.classifiedAs.nonEmpty) {
        if (n.content.toLowerCase(java.util.Locale.ROOT) == "[no locality data]") {
          if (n.classifiedAs.contains(PrimaryName)) p = i
        } else alt = i
      }
      i += 1
    }
    if (p < 0 || alt < 0) names
    else names.updated(p, names(p).copy(content = names(alt).content))
      .patch(alt, Nil, 1)
  }

  /** defined_by survives only when POLYGON/POINT-prefixed (`:86-90`). */
  def ypmDefinedBy(raw: String): Option[String] = {
    val t = raw.trim
    if (t.startsWith("POLYGON") || t.startsWith("POINT")) Some(t) else None
  }

  private val ypmAccessionCxns = Set(
    "http://vocab.getty.edu/aat/300404620",
    "http://vocab.getty.edu/aat/300404621",
    "http://vocab.getty.edu/aat/300312355")

  /** Collection Item append (`ypm:94-115` / `yuag:139-158`): YPM gates
    * on HumanMadeObject + three accession classes; YUAG on the single
    * catalog class with NO type gate. */
  def collectionItem(recType: String, identifierCxns: Seq[String],
      classes: Seq[String], yuag: Boolean): Seq[String] = {
    val gate = if (yuag) Set("http://vocab.getty.edu/aat/300312355")
      else ypmAccessionCxns
    val typeOk = yuag || recType == "HumanMadeObject"
    if (typeOk && identifierCxns.exists(gate)) classes :+ CollectionItem
    else classes
  }

  // ------------------------------------------------------------ YUAG

  /** Group + born/died retypes to Person; equivalents follow (`:26-31`). */
  def yuagRetype(recType: String, hasBornOrDied: Boolean): String =
    if (recType == "Group" && hasBornOrDied) "Person" else recType

  /** identified_by repair (`:59-76`): (type, content) where content is
    * Left(number) or Right(string) or None. Returns (type, content,
    * primaryClassified). */
  def yuagNames(names: Seq[(String, Option[Either[Long, String]])])
      : Seq[(String, String, Boolean)] =
    names.flatMap { case (t, c) =>
      val (nt, primary) = if (t == "Primary Name") ("Name", true) else (t, false)
      c.map(e => (nt, e.fold(_.toString, identity), primary))
    }

  /** Activity timespan hoist (`:82-84`): (timespan, keepPartOf). */
  def yuagActivityTimespan(ts: Option[String],
      partOfFirstTs: Option[String]): (Option[String], Boolean) =
    if (ts.isEmpty && partOfFirstTs.isDefined) (partOfFirstTs, false)
    else (ts, true)

  /** took_place_at split (`:85-101`): ids containing `/agt/` become
    * carried_out_by Groups, everything else (id-less included) stays a
    * took_place_at Place. Returns (carriedOutBy, tookPlaceAt). */
  def yuagActivityPlaces(refs: Seq[String]): (Seq[String], Seq[String]) =
    refs.partition(r => r.nonEmpty && r.contains("/agt/"))

  // ------------------------------------------------------------- PMC

  /** Group part_of → member_of (`:14-16`): (memberOf, partOf). */
  def pmcGroupPartOf(recType: String,
      partOf: Seq[String]): (Seq[String], Seq[String]) =
    if (recType == "Group") (partOf, Nil) else (Nil, partOf)

  private val PmcArchive = "http://vocab.getty.edu/aat/300375748"
  private val PmcCollection = "http://vocab.getty.edu/aat/300025976"

  /** Archive+collection Sets drop the collection class (`:18-25`). */
  def pmcSetClasses(recType: String, cxns: Seq[String]): Seq[String] =
    if (recType == "Set" && cxns.contains(PmcArchive) &&
      cxns.contains(PmcCollection)) cxns.filterNot(_ == PmcCollection)
    else cxns

  private val pmcNoteKills = Set(
    "http://vocab.getty.edu/aat/300435438",
    "http://vocab.getty.edu/aat/300055863",
    "http://vocab.getty.edu/aat/300055458")

  /** Notes with any internal note class are purged (`:27-40`). */
  def pmcNotes(notes: Seq[(String, Seq[String])]): Seq[String] =
    notes.collect { case (content, cxns)
      if !cxns.exists(pmcNoteKills) => content }
}
