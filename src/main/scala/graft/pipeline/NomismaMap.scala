package graft.pipeline

import graft.functions.DateLib

/** Nomisma (numismatics authority) mapper core — exemplar port of
  * `pipeline/sources/authorities/nomisma/mapper.py` (285 LoC, the
  * largest previously-uncovered per-source mapper):
  *
  *   - type routing (`:25-50`): the record's @type LIST is scanned in
  *     order and the FIRST recognized type wins (the loop breaks) —
  *     Mint/Region → Place, Deity/Person → Person, Collection/Family/
  *     Organization/Ethnic/Group → Group, Denomination/Material/
  *     ObjectType/NumismaticTerm/TypeSeries → Type; an unrecognized
  *     list routes nowhere (the reference leaves `topcls` unbound and
  *     crashes — we return None);
  *   - nm-ref extraction (`:139-152,180-214`): `bid.split('nm:')[-1]`,
  *     the segment after the LAST `nm:`. The guarding try/except
  *     ("only do it if Nomisma refs") can never fire — str.split
  *     succeeds on every string — so a non-nomisma URI passes through
  *     WHOLE and gets the namespace wrapped around it. Quirk ported.
  *   - broader routing (`:131-152`): only Place and Type records
  *     process skos:broader; Place stores it as part_of, Type as
  *     broader;
  *   - geospatial (`:166-175`): the `#this` geo:SpatialThing node's
  *     lat/long render as `POINT ( <long> <lat> )` — reference
  *     spacing, lon first;
  *   - person membership (`:180-214`): org:hasMembership indirects
  *     through a membership node to its org:organization; org:memberOf
  *     is direct; both nm-split, order preserved, duplicates kept;
  *   - gYear events (`:216-285`): birth/death (person) and formation/
  *     dissolution (group) dates parse ONLY when typed xsd:gYear; the
  *     raw value becomes the display name; an unparseable value drops
  *     the whole event;
  *   - homepage (`:154-163`): only the FIRST foaf:homepage is accepted.
  *
  * Pure per-record functions for a `Dataset.map` stage, like the other
  * mapper exemplars. */
object NomismaMap {

  private val placeTypes = Set("nmo:Mint", "nmo:Region")
  private val personTypes = Set("wordnet:Deity", "foaf:Person")
  private val groupTypes = Set("nmo:Collection", "rdac:Family",
    "foaf:Organization", "nmo:Ethnic", "foaf:Group")
  private val typeTypes = Set("nmo:Denomination", "nmo:Material",
    "nmo:ObjectType", "nmo:NumismaticTerm", "nmo:TypeSeries")

  /** First recognized @type in record order wins (`:29-50`). */
  def route(types: Seq[String]): Option[String] = types.collectFirst {
    case t if placeTypes(t) => "Place"
    case t if personTypes(t) => "Person"
    case t if groupTypes(t) => "Group"
    case t if typeTypes(t) => "Type"
  }

  /** `split('nm:')[-1]` — non-nomisma ids pass through whole (`:139-143`). */
  def nmRef(id: String): String = {
    val i = id.lastIndexOf("nm:")
    if (i < 0) id else id.substring(i + 3)
  }

  /** Reference URI for an nm-split ref (`:146-152`). */
  def refUri(namespace: String, id: String): String =
    s"$namespace${nmRef(id)}.jsonld"

  /** broader lands on part_of (Place) or broader (Type) — other
    * classes skip the property entirely (`:131-134`). */
  def broaderProp(topcls: String): Option[String] = topcls match {
    case "Place" => Some("part_of")
    case "Type"  => Some("broader")
    case _       => None
  }

  /** `POINT ( <long> <lat> )` — reference spacing (`:173`). */
  def pointWkt(lat: String, long: String): Option[String] =
    if (lat.nonEmpty && long.nonEmpty) Some(s"POINT ( $long $lat )")
    else None

  /** gYear-gated event span (`:219-243`): (begin, end, display); None
    * when the date is not xsd:gYear or fails to parse. */
  def gYearSpan(dtype: String, value: String): Option[(String, String, String)] =
    if (dtype != "xsd:gYear") None
    else DateLib.makeDatetime(value).map(r => (r.begin, r.end, value))

  /** Person member_of (`:180-214`): hasMembership ids resolve through
    * the graph's membership nodes to their organization; memberOf ids
    * are direct. Order preserved, duplicates kept (the reference
    * appends blindly). */
  def memberships(namespace: String, hasMembership: Seq[String],
      membershipOrg: Map[String, String], memberOf: Seq[String]): Seq[String] = {
    val viaNode = for {
      memId <- hasMembership if memId.nonEmpty
      org <- membershipOrg.get(memId).toSeq if org.nonEmpty
    } yield refUri(namespace, org)
    val direct = memberOf.filter(_.nonEmpty).map(refUri(namespace, _))
    viaNode ++ direct
  }

  /** Only the first homepage is accepted (`:157-158`). */
  def homepage(pages: Seq[String]): Option[String] = pages.headOption
}
