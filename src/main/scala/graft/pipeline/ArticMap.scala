package graft.pipeline

import graft.functions.DateLib

/** The Art Institute of Chicago (artic) museum mapper core — exemplar
  * port of `pipeline/sources/museums/artic/mapper.py` (478 LoC, the
  * JSON-API museum shape):
  *
  *   - `guess_type` (`:13-25`): api_model routing — `artworks` →
  *     HumanMadeObject, `exhibitions` → Activity, `agents` split
  *     Person/Group on the `is_artist` flag (everything else Group);
  *   - URI minting per class (`:36-43`): the three API endpoints;
  *   - `handle_timespan` (`:75-119`): date strings longer than 10
  *     chars are truncated at the `T`; LIFE events (birth/formation/
  *     death/dissolution) collapse the parsed range to
  *     (begin_of_the_begin, end_of_the_end); other events build the
  *     full four-point from (date1, date2) with a fallback matrix —
  *     both parse → begin pair from date1 and end pair from date2;
  *     only one parses → that side's range collapses to (bb, ee); the
  *     display name is date3 when present, else the date text (with
  *     `d1 - d2` when both sides parsed);
  *   - category-term routing (`:238-284`): technique/material/style/
  *     subject ids look up an AAT concordance, and a MISS changes the
  *     target property — materials without an AAT become a
  *     MaterialStatement note instead of `made_of`, styles degrade
  *     from Style to a bare Type, techniques/subjects keep their
  *     property with a label-only Type;
  *   - artist assembly (`:229-235`): `dict(zip(artist_ids,
  *     artist_titles))` — duplicate ids keep their FIRST position but
  *     the LAST title (Python dict update semantics), each becoming a
  *     production `carried_out_by`.
  *
  * Pure per-record functions for a `Dataset.map` stage, like GettyMap,
  * FastMap and LcNames. */
object ArticMap {

  def guessType(apiModel: String, isArtist: Boolean): String = apiModel match {
    case "artworks" => "HumanMadeObject"
    case "exhibitions" => "Activity"
    case "agents" if isArtist => "Person"
    case _ => "Group"
  }

  def mintUri(cls: String, id: Long): String = cls match {
    case "Person" | "Group" => s"https://api.artic.edu/api/v1/agents/$id"
    case "HumanMadeObject" => s"https://api.artic.edu/api/v1/artworks/$id"
    case "Activity" => s"https://api.artic.edu/api/v1/exhibitions/$id"
    case other => sys.error(s"no endpoint for $other")
  }

  // rsplit('T')[0] fires only on >10 chars; no 'T' leaves the value alone
  private def trimT(d: String): String =
    if (d.length > 10 && d.contains("T")) d.substring(0, d.indexOf('T')) else d

  final case class Timespan(bb: String, eb: String, be: String, ee: String,
      display: String)

  /** handle_timespan. `life` = the event is Birth/Formation/Death/
    * Dissolution. Dates arrive as strings (the reference int-coerces
    * first). In the non-life matrix an unparseable side falls out of
    * the four-point exactly as the reference's truthiness branches do;
    * on the life path the reference indexes the parse result
    * unguarded (`:85-87` would raise) — this port degrades to an
    * empty timespan instead, keeping the display name. */
  def timespan(date1: String, date2: Option[String],
      date3: Option[String], life: Boolean): Timespan = {
    val d1 = trimT(date1)
    val begins = DateLib.makeDatetime(d1)
    if (life) {
      val disp = date3.getOrElse(d1)
      begins match {
        case Some(r) => Timespan(r.begin, "", "", r.end, disp)
        case None => Timespan("", "", "", "", disp)
      }
    } else {
      val d2 = date2.map(trimT)
      val ends = d2.flatMap(DateLib.makeDatetime(_))
      (begins, ends) match {
        case (Some(b), Some(e)) =>
          Timespan(b.begin, b.end, e.begin, e.end,
            date3.getOrElse(s"$d1 - ${d2.get}"))
        case (Some(b), None) =>
          Timespan(b.begin, "", "", b.end, date3.getOrElse(d1))
        case (None, Some(e)) =>
          Timespan(e.begin, "", "", e.end, date3.getOrElse(d2.get))
        case (None, None) => Timespan("", "", "", "", "")
      }
    }
  }

  /** Category-term routing: (property, ident, label) for one
    * technique/material/style/subject id. A concordance MISS demotes
    * the node — materials to a statement, styles to a plain Type. */
  def categoryRoute(category: String, aat: Option[String],
      title: String): (String, String, String) = {
    val ident = aat.map(a => s"https://vocab.getty.edu/aat/$a").getOrElse("")
    category match {
      case "technique" => ("production.technique", ident, title)
      case "material" => aat match {
        case Some(_) => ("made_of", ident, title)
        case None => ("referred_to_by.MaterialStatement", "", title)
      }
      case "style" => aat match {
        case Some(_) => ("shows.classified_as.Style", ident, title)
        case None => ("shows.classified_as.Type", "", title)
      }
      case "subject" => ("shows.represents", ident, title)
      case other => sys.error(s"unknown category $other")
    }
  }

  /** dict(zip(ids, titles)): first position, last title per id. */
  def artists(ids: Seq[Long], titles: Seq[String]): Seq[(Long, String)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    for ((id, t) <- ids.zip(titles)) m(id) = t
    m.toSeq
  }
}
