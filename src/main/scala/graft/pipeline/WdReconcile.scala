package graft.pipeline

/** J3: the wikidata URI-voting reconciler — re-expression of
  * `pipeline/sources/general/wikidata/reconciler.py:57-137`. Votes are
  * (key, qid) pairs: `key` is the prefixed equivalent ("aat:300…",
  * "viaf:123…") that resolved in the inverse-equivalence index, `qid`
  * the wikidata id it voted for; `truth` is a wikidata id asserted by
  * the record itself (`:83-84`).
  *
  * Decision tree (faithful, including rule order):
  *   - no votes → None (`:94-95`);
  *   - one distinct qid → it, unless a differing `truth` vetoes
  *     (`:88-93`);
  *   - multiple distinct: any `truth` → None (`:106-113`; the reference
  *     defers both agree- and disagree-cases to manual checks);
  *     - more than 2 votes (`:114`):
  *       1. exactly two distinct qids and exactly one of them has ≥2
  *          votes → it (`:115-119`);
  *       2. strip viaf:/geonames: voters (the noisy sources, `:120-123`);
  *          a single surviving qid wins;
  *       3. a ≥2:1 count majority wins (`:124-129`);
  *     - exactly 2 votes: only the viaf/geonames strip applies
  *       (`:130-134`);
  *   - otherwise None.
  *
  * Pure per-record function for a `groupByKey(rec).mapGroups` stage:
  * one shuffle on the record key, decision map-side after it.
  */
object WdReconcile {

  private def strip(m: Map[String, String]): Set[String] =
    m.collect { case (k, v)
      if !k.startsWith("viaf:") && !k.startsWith("geonames:") => v }.toSet

  def decide(votes: Seq[(String, String)], truth: Option[String]): Option[String] = {
    val ids = votes.toMap // dict semantics: last write per key wins
    val distinct = ids.values.toSet
    if (ids.isEmpty) None
    else if (distinct.size == 1) {
      val rec = distinct.head
      if (truth.exists(_ != rec)) None else Some(rec)
    } else if (truth.isDefined) None
    else if (ids.size > 2) {
      val ivtd = ids.groupBy(_._2).map { case (q, kv) => q -> kv.keys.toSeq }
      val ruleA =
        if (ivtd.size == 2) {
          val poss = ivtd.collect { case (q, ks) if ks.size > 1 => q }.toSeq
          if (poss.size == 1) Some(poss.head) else None
        } else None
      ruleA.orElse {
        val surv = strip(ids)
        if (surv.size == 1) Some(surv.head)
        else {
          val counts = ivtd.map { case (q, ks) => (q, ks.size) }.toSeq
            .sortBy { case (q, n) => (-n, q) } // deterministic tie order
          if (counts.head._2 >= 2 * counts(1)._2) Some(counts.head._1)
          else None
        }
      }
    } else {
      val surv = strip(ids)
      if (surv.size == 1) Some(surv.head) else None
    }
  }
}
