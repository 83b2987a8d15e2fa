package graft.pipeline

/** The Yale University Library (YUL/ils) mapper core — exemplar port of
  * `pipeline/sources/yale/library/mapper.py` (450 LoC, the internal-
  * unit post-mapping shape; YCBA's sibling quirks live in
  * `m12_ycba_clean`):
  *
  *   - parenthetical place parents (`:283-322`): a Place's primary
  *     name `X (par)` resolves `par` against the known-places table —
  *     `:`-qualified forms test both sides (`Norfolk, England :
  *     Parish` vs `Sweden : Kommun`), comma forms prefer the RIGHT
  *     side (country) then the left, and an ` and `-joined pair picks
  *     the first known side; the winner becomes `part_of`. Membership
  *     tests follow the reference exactly, including which candidates
  *     are stripped before lookup and which are not;
  *   - `walk_multi` (`:101-119`): multi-valued properties are
  *     listified, single-valued properties collapse to their first
  *     element — the JSON normalization every downstream walk relies
  *     on;
  *   - MarcGT→AAT classification swaps and the sort-title AAT id swap
  *     (`:377-390`, note the https→http normalization).
  *
  * Pure per-record functions for a `Dataset.map` stage, like the other
  * mapper exemplars. */
object YulMap {

  private val parensRe = "^(.+) \\((.+)\\)$".r

  /** The reference's multi_props / single_props tables (`:10-34`). */
  val multiProps: Set[String] = Set("part_of", "identified_by",
    "classified_as", "equivalent", "member_of", "subject_of",
    "referred_to_by", "influenced_by", "about", "carries", "shows",
    "attributed_by", "carried_out_by", "took_place_at")
  val singleProps: Set[String] = Set("timespan", "produced_by",
    "created_by", "content", "begin_of_the_begin", "end_of_the_end",
    "value")

  /** walk_multi's normalization decision for one property. */
  def normalize(prop: String, values: Seq[String]): Seq[String] =
    if (singleProps(prop) && values.length > 1) values.take(1)
    else values // multi props are already lists here; others untouched

  /** Parenthetical parent resolution (`:283-322`). `known` is the
    * parenthetical_places table's key set. */
  def parensParent(nameRaw: String, known: Set[String]): Option[String] = {
    val name = nameRaw.trim
    parensRe.findFirstMatchIn(name).flatMap { m =>
      val par = m.group(2).trim
      val test: Seq[String] =
        if (par.contains(":")) par.split(":", 2).toSeq else Seq(par)
      var parent: Option[String] = None
      for (t <- test if parent.isEmpty) {
        // the comma guard tests the UNSTRIPPED candidate (faithful)
        if (t.contains(",") && !known(t)) {
          val Array(a, b) = t.split(",", 2)
          if (known(b.trim)) parent = Some(b.trim)
          else if (known(a.trim)) parent = Some(a.trim)
        } else if (known(t.trim)) parent = Some(t.trim)
      }
      if (parent.isEmpty && par.contains(" and ") && !known(par)) {
        val Array(a, b) = par.split(" and ", 2)
        if (known(a.trim)) parent = Some(a.trim)
        else if (known(b.trim)) parent = Some(b.trim)
      }
      parent
    }
  }

  /** MarcGT genre → AAT swaps (`:377-383`). */
  def marcgtSwap(id: String): String = id match {
    case "http://id.loc.gov/vocabulary/marcgt/rea" =>
      "http://vocab.getty.edu/aat/300265419"
    case "http://id.loc.gov/vocabulary/marcgt/pic" =>
      "http://vocab.getty.edu/aat/300264388"
    case other => other
  }

  /** Sort-title classification swap (`:386-390`) — note the reference
    * matches the httpS form and emits the http form. */
  def sortTitleSwap(id: String): String =
    if (id == "https://vocab.getty.edu/aat/300451544")
      "http://vocab.getty.edu/aat/300456575"
    else id
}
