package graft.pipeline

/** NDL (National Diet Library, japan) mapper core — exemplar port of
  * `pipeline/sources/libraries/japan/mapper.py` (344 LoC; guess_type
  * was already covered in LongTail, this covers the rest):
  *
  *   - handle_common name assembly (`:52-106`) with its dupes
  *     discipline: the preferred literal (prefLabel.literalForm,
  *     falling back to the bare label) seeds the guard; the pref
  *     transcriptions emit as PrimaryNames BEFORE the preferred
  *     literal itself (order quirk); transcription values are guarded
  *     by the dupes dict but NEVER ADDED to it, so a repeated
  *     transcription emits twice; alt literalForms are guarded AND
  *     added (the empty string too); alt transcriptions behave like
  *     pref ones. Languages come from the @language tag's primary
  *     subtag (`split('-')[0]`) gated through process_langs;
  *   - primaryTopic.name lands as one more alternate, dupes-guarded
  *     (`:262-265`);
  *   - previousName/laterName (`:216-239`) become attribute
  *     assignments classified with the wikidata "Previous Name" /
  *     "Later Name" entities — and their label fallback reads a
  *     variable that is UNBOUND in the reference (preflbl inside
  *     handle_group), so a record missing those labels CRASHES the
  *     reference; we require the label and document the edge;
  *   - person biography (`:140-152`): fieldOfActivityOfThePerson
  *     statements carry the Japanese language tag, plain
  *     biographicalInformation statements carry NONE.
  *
  * Pure per-record functions for a `Dataset.map` stage. */
object JapanMap {

  final case class JName(content: String, lang: Option[String],
      primary: Boolean)

  /** @language primary subtag gated through process_langs (`:66-69`). */
  def langOf(tag: String): Option[String] =
    Some(tag.split("-", 2)(0)).filter(LcNames.processLangs)

  /** The full handle_common name assembly + the primaryTopic.name
    * alternate. `prefTxns`/`alts` carry (value, languageTag) pairs. */
  def names(prefLiteral: String, labelFallback: String,
      prefTxns: Seq[(String, String)],
      alts: Seq[(String, Seq[(String, String)])],
      topicName: String): Seq[JName] = {
    val preflbl = if (prefLiteral.nonEmpty) prefLiteral else labelFallback
    val dupes = scala.collection.mutable.Set(preflbl)
    val out = scala.collection.mutable.ArrayBuffer.empty[JName]
    // pref transcriptions FIRST — guarded by dupes, never added to it
    for ((v, l) <- prefTxns if v.nonEmpty && !dupes(v))
      out += JName(v, langOf(l), primary = true)
    if (preflbl.nonEmpty) out += JName(preflbl, None, primary = true)
    for ((lit, txns) <- alts) {
      if (!dupes(lit)) {
        dupes += lit // the empty string is added too
        if (lit.nonEmpty) out += JName(lit, None, primary = false)
      }
      for ((v, l) <- txns if v.nonEmpty && !dupes(v))
        out += JName(v, langOf(l), primary = false)
    }
    if (topicName.nonEmpty && !dupes(topicName))
      out += JName(topicName, None, primary = false)
    out.toSeq
  }

  /** previousName/laterName classification entities (`:225,238`). */
  def renameClass(later: Boolean): String =
    if (later) "http://www.wikidata.org/entity/Q79030284" // Later Name
    else "http://www.wikidata.org/entity/Q79030196" // Previous Name

  /** Person biography statements (`:140-152`): fieldOfActivity rows
    * carry "ja", biographicalInformation rows carry no language.
    * Returns (content, lang). */
  def personBio(fields: Seq[String],
      biogs: Seq[String]): Seq[(String, String)] =
    fields.map((_, "ja")) ++ biogs.map((_, ""))
}
