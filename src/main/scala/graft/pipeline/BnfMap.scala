package graft.pipeline

/** The BnF (Bibliothèque nationale de France) mapper core — exemplar
  * port of `pipeline/sources/libraries/bnf/mapper.py` (597 LoC, the
  * JSON-LD @graph shape):
  *
  *   - `reconstitute` (`:303-319`): the @graph node list is rebuilt
  *     into a nested tree by inlining referenced nodes, CONSUMING each
  *     node on first use (deleted from the pool before recursing) — a
  *     node referenced twice inlines only at its first reference and
  *     stays a bare id at the second, and cycles terminate because the
  *     revisited node is already gone. Scalars pass through;
  *   - skos label handling (`:370-396`): prefLabel (string or
  *     value/language object) → PrimaryName with the language attached
  *     only when process_langs maps it (the name itself is always
  *     kept — unlike Getty's drop); altLabel list normalization with
  *     the same rule;
  *   - `skos:broader` with the `bnf-onto:domaine` FALLBACK (`:398-413`):
  *     domaine is consulted only when broader is empty;
  *   - exactMatch + closeMatch equivalents with first-seen dedupe
  *     across BOTH lists (`:415-434`, the eq_dupes dict).
  *
  * Pure per-record functions for a `Dataset.map` stage, like the other
  * mapper exemplars. */
object BnfMap {

  sealed trait BnfVal
  final case class Scalar(v: String) extends BnfVal
  final case class Ref(id: String) extends BnfVal

  final case class BnfNode(id: String, props: Seq[(String, BnfVal)])

  /** reconstitute, rendered to a canonical string: `id{k=v,k=child{…},
    * k=@ref}` — `@ref` marks a reference left bare because its node was
    * already consumed (or never present). */
  def reconstitute(rootId: String, nodes: Seq[BnfNode]): Option[String] = {
    val remaining = scala.collection.mutable.LinkedHashMap(
      nodes.map(n => n.id -> n): _*)
    def go(n: BnfNode): String = {
      remaining.remove(n.id) // consume BEFORE recursing (the cycle guard)
      val parts = n.props.map {
        case (k, Scalar(v)) => s"$k=$v"
        case (k, Ref(r)) => remaining.get(r) match {
          case Some(child) => s"$k=${go(child)}"
          case None => s"$k=@$r"
        }
      }
      s"${n.id}{${parts.mkString(",")}}"
    }
    remaining.get(rootId).map(go)
  }

  final case class BnfLabel(content: String, lang: Option[String])

  /** prefLabel/altLabel: the language survives only when process_langs
    * maps it; the label itself always survives. */
  def label(content: String, lang: Option[String]): BnfLabel =
    BnfLabel(content, lang.filter(LcNames.processLangs))

  /** skos:broader with the bnf-onto:domaine fallback. */
  def broaderOrDomaine(broader: Seq[String], domaine: Seq[String]): Seq[String] =
    if (broader.nonEmpty) broader else domaine

  /** exactMatch ++ closeMatch with first-seen dedupe (eq_dupes). */
  def equivalents(exact: Seq[String], close: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    for (uri <- exact ++ close if uri.nonEmpty) seen += uri
    seen.toSeq
  }
}
