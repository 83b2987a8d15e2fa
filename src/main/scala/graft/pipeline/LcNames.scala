package graft.pipeline

/** The LC authority mapper's name/equivalence core — exemplar port of
  * the largest single per-source mapper
  * (`pipeline/sources/authorities/lc/mapper.py`, 1024 LoC):
  *
  *   - `map_label` (:187-212): madsrdf:authoritativeLabel list → primary
  *     names; `_label` = first value; language kept only when it is in
  *     the process_langs table;
  *   - variant handling (:218-237): madsrdf:hasVariant →
  *     madsrdf:variantLabel alternate names, language from the VARIANT
  *     node's own @language;
  *   - `map_common`'s equivalence selection (:251-340): identifiesRWO
  *     URIs with the dbpedia/bbc/musicbrainz drop, the TGN `-place`
  *     strip, the viaf-seen flag, and the loc.gov/rwo skip; exact
  *     external authorities + later/earlier established forms (skipped
  *     for Groups) deduped against the list and against a seen viaf;
  *     closeMatch as last resort — bnf dropped, wikidata capping the
  *     list at 4 (the reference's `sawwd` flag is initialized False and
  *     never set, so the close loop always runs; ported faithfully).
  *
  * Pure per-record functions for a `Dataset.map` stage, like WdClaims. */
object LcNames {

  /** The process_langs lookup keys (the reference maps lang code →
    * language entity; membership is what gates attachment). */
  val processLangs: Set[String] = Set("en", "fr", "de", "es", "zh", "ru", "ja")

  final case class LcName(content: String, lang: Option[String], primary: Boolean)

  /** map_label: first value becomes the record label; languages outside
    * process_langs are dropped from the name (not the name itself). */
  def mapLabel(prefs: Seq[(String, Option[String])]): (Option[String], Seq[LcName]) =
    if (prefs.isEmpty) (None, Nil)
    else (Some(prefs.head._1), prefs.map { case (v, l) =>
      LcName(v, l.filter(processLangs), primary = true)
    })

  /** hasVariant → AlternateName; language from the variant node. */
  def variants(alts: Seq[(String, Option[String])]): Seq[LcName] =
    alts.map { case (v, l) => LcName(v, l.filter(processLangs), primary = false) }

  /** map_common:251-340 equivalence selection. `laterEarlier` is the
    * established-forms list (ignored for Groups, :259-284). */
  def selectEquivalents(idby: Seq[String], exact: Seq[String],
      laterEarlier: Seq[String], close: Seq[String],
      isGroup: Boolean): Seq[String] = {
    val eqs = scala.collection.mutable.ArrayBuffer.empty[String]
    var sawViaf = false
    for (uri <- idby) {
      if (uri.contains("dbpedia.org") || uri.contains("bbc.co.uk") ||
        uri.contains("musicbrainz.org")) () // dropped (:299-301)
      else if (uri.contains("/tgn/") && uri.contains("-place"))
        eqs += uri.replace("-place", "") // :302-303
      else if (uri.contains("viaf.org/viaf")) { sawViaf = true; eqs += uri }
      else if (uri.contains("loc.gov/rwo")) () // handled separately (:306-308)
      else eqs += uri
    }
    for (uri <- exact ++ (if (!isGroup) laterEarlier else Nil))
      if (!eqs.contains(uri) && !(uri.contains("viaf.org/viaf/") && sawViaf))
        eqs += uri
    // closeMatch last resort; wikidata appends cap the list at 4 (:319-338)
    var stop = false
    for (uri <- close if !stop) {
      if (uri.contains("bnf.fr/") || eqs.contains(uri)) ()
      else if (uri.contains("wikidata")) {
        eqs += uri
        if (eqs.length >= 4) stop = true
      } else eqs += uri
    }
    eqs.distinct.toSeq // the doneids final dedupe (:333-340)
  }

  // ---- LC loader quirks (`lc/loader.py:7-91`) ----

  /** externallinks.nt sideload (`:12-36`): only id.loc.gov/authorities
    * subjects with Close/ExactExternalAuthority predicates contribute;
    * the identifier is the subject's last path segment (closing `>`
    * stripped), the target the object IRI shorn of its brackets. */
  def externalLink(line: String): Option[(String, String)] =
    if (line.startsWith("<http://id.loc.gov/authorities/") &&
      (line.contains("CloseExternalAuthority") ||
        line.contains("ExactExternalAuthority"))) {
      val parts = line.dropRight(2).split(" ", 3)
      if (parts.length < 3) None
      else {
        val ident = parts(0).split('/').last.dropRight(1)
        val tgt = parts(2).trim.drop(1).dropRight(1)
        Some((ident, tgt))
      }
    } else None

  /** get_identifier_raw (`:38-47`): last `"@id":` occurrence, last
    * path segment, stray `"}` stripped. */
  def rawIdentifier(l: String): Option[String] = {
    val pos = l.lastIndexOf("\"@id\":")
    if (pos < 0) None
    else l.substring(pos).split('/').lastOption
      .map(_.replace("\"}", "").trim)
      .filter(_.nonEmpty)
  }

  private val undifferentiated =
    "http://id.loc.gov/authorities/names/collection_NamesUndifferentiated"

  /** post_process_json's record skips (`:66-91`): `-781` geographic
    * subdivisions and NamesUndifferentiated collection members. */
  def skipRecord(ident: String, collections: Seq[String]): Boolean =
    ident.endsWith("-781") || collections.contains(undifferentiated)
}
