package graft.pipeline

/** Long-tail per-source mapper quirks — the distinctive moves of the
  * remaining small reference mappers, one place each:
  *
  *   - Pleiades `geojson_to_wkt` / `bbox_to_wkt`
  *     (`pipeline/sources/pleiades/mapper.py:19-50`): Point, Polygon
  *     keeping ONLY the exterior ring, MultiPolygon keeping each
  *     poly's exterior; unknown geometry types → None; bbox renders
  *     as the closed 5-point lower-left-first ring. Coordinates pass
  *     through as decimal TEXT so no float formatting can diverge;
  *   - NDL (japan) `guess_type`
  *     (`pipeline/sources/libraries/japan/mapper.py:10-30`):
  *     primaryTopic foaf type first (Person/Organization/Family),
  *     then inScheme routing — uniformTitles explicitly unmapped,
  *     geographicNames → Place, topicalTerms → Type;
  *   - VIAF (oclc) nameType map + `fix_identifier`
  *     (`pipeline/sources/authorities/oclc/mapper.py:27,92-96`):
  *     Personal/Corporate/Geographic; `sourceID/` identifiers are
  *     refused; the data.bnf.fr hash-suffixed sameAs URIs ignored;
  *   - ORCID `make_date`
  *     (`pipeline/sources/general/orcid/mapper.py:73-93`): zero-pad
  *     single-digit month/day, year+month defaults day 01, bare year
  *     passes through, no year → None;
  *   - SNAC `create_event` property naming
  *     (`pipeline/sources/archives/snac/mapper.py:65-81`): the event
  *     attaches via `setattr(top, event.lower(), …)` — producing
  *     `birth`/`death` attributes where Linked Art uses `born`/`died`
  *     (a reference quirk, ported faithfully and documented).
  */
object LongTail {

  /** One linear ring as (x, y) coordinate TEXT pairs. */
  type Ring = Seq[(String, String)]

  def pointWkt(lon: String, lat: String): String = s"POINT ($lon $lat)"

  private def ringStr(r: Ring): String =
    r.map { case (x, y) => s"$x $y" }.mkString(", ")

  /** Polygon keeps only the exterior (first) ring — faithful to
    * `mapper.py:28-31`, which builds all rings then emits rings[0]. */
  def polygonWkt(rings: Seq[Ring]): Option[String] =
    rings.headOption.map(r => s"POLYGON ((${ringStr(r)}))")

  def multiPolygonWkt(polys: Seq[Seq[Ring]]): Option[String] =
    if (polys.isEmpty) None
    else Some("MULTIPOLYGON (" +
      polys.flatMap(_.headOption).map(r => s"((${ringStr(r)}))")
        .mkString(", ") + ")")

  def geojsonToWkt(geomType: String, rings: Seq[Seq[Ring]]): Option[String] =
    geomType match {
      case "Point" => rings.headOption.flatMap(_.headOption)
        .flatMap(_.headOption).map { case (x, y) => pointWkt(x, y) }
      case "Polygon" => rings.headOption.flatMap(polygonWkt)
      case "MultiPolygon" => multiPolygonWkt(rings)
      case _ => None
    }

  def bboxWkt(minx: String, miny: String, maxx: String, maxy: String): String =
    s"POLYGON (($minx $miny, $maxx $miny, $maxx $maxy, $minx $maxy, $minx $miny))"

  /** NDL: foaf topic type first, then inScheme. */
  def ndlClass(topicTypeUri: String, inSchemeUri: String): Option[String] =
    topicTypeUri match {
      case "http://xmlns.com/foaf/0.1/Person" => Some("Person")
      case "http://xmlns.com/foaf/0.1/Organization" => Some("Group")
      case "http://RDVocab.info/uri/schema/FRBRentitiesRDA/Family" =>
        Some("Family")
      case _ => inSchemeUri match {
        case "http://id.ndl.go.jp/auth#uniformTitles" => None
        case "http://id.ndl.go.jp/auth#geographicNames" => Some("Place")
        case "http://id.ndl.go.jp/auth#topicalTerms" => Some("Type")
        case _ => None
      }
    }

  private val viafNameTypes = Map(
    "Personal" -> "Person", "Corporate" -> "Group", "Geographic" -> "Place")

  def viafClass(nameType: String): Option[String] = viafNameTypes.get(nameType)

  def viafIdentifier(identifier: String): Option[String] =
    if (identifier.startsWith("sourceID/")) None else Some(identifier)

  val viafIgnoreSameas: Set[String] = Set(
    "http://data.bnf.fr/#foaf:Person", "http://data.bnf.fr/#foaf:Organization",
    "http://data.bnf.fr/#spatialThing", "http://data.bnf.fr/#owl:Thing")

  /** ORCID make_date: pad, default day, bare year, or nothing. */
  def orcidDate(y: Option[String], m: Option[String],
      d: Option[String]): Option[String] = {
    def pad(v: String) = if (v.length == 1) "0" + v else v
    (y, m, d) match {
      case (Some(yy), Some(mm), Some(dd)) => Some(s"$yy-${pad(mm)}-${pad(dd)}")
      case (Some(yy), Some(mm), None) => Some(s"$yy-${pad(mm)}-01")
      case (Some(yy), None, _) => Some(yy)
      case _ => None
    }
  }

  /** SNAC event property name — `event.lower()`, quirk and all. */
  def snacProperty(event: String): Option[String] =
    if (Set("Birth", "Death", "Formation", "Dissolution", "Activity")(event))
      Some(event.toLowerCase(java.util.Locale.ROOT))
    else None
}
