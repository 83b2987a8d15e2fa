package graft.operators

import graft.functions.{DateLib, Wkt}

/** The full Linked-Art record merger (SURVEY A1-A3 + J10) — a pure-Scala
  * re-expression of the reference's `RecordMerger`
  * (`pipeline/process/merger.py:86-958`) over a typed record model, driven
  * per-cluster as an order-sensitive fold (records pre-sorted by
  * merge_order, `merger.py:62-63`).
  *
  * Rules carried over, cited to the reference:
  *   - type-conflict resolution: prefer Language/Material/MeasurementUnit/
  *     Currency over Type, otherwise abort the pair (merger.py:683-694)
  *   - copy-if-absent for fields the base lacks (merger.py:704-707)
  *   - identified_by dedupe on (kind, trim-lower content) with primary-name
  *     arbitration and language union (merger.py:750-842)
  *   - referred_to_by dedupe by content with the single-"AI generated"
  *     statement rule (merger.py:844-872)
  *   - subject_of / representation dedupe by access-point id
  *     (merger.py:874-890, :900-916)
  *   - id-set union for classified_as / equivalent / member_of
  *     (merger.py:892-898)
  *   - class dispatch (merger.py:912-924): Place geometry + part_of
  *     (:177-244), actor residence/contact_point (:256-302), dimension
  *     identity (unit,value,class) (:358-378), ref unions for
  *     object/work-ish classes (:317-345, :380-536), broader union (:167-175)
  *   - activity timespan: end-of-year fixup, estimated-throwout, keep the
  *     most specific (smallest) interval (merger.py:542-622)
  *   - should_merge source-pair vetoes (merger.py:926-958; the concrete
  *     veto mirrors `sources/yale/ycba/mapper.py:13-27`)
  *   - pre_merge_fixes: external part_of trumps internal Place part_of
  *     (merger.py:18-35)
  *
  * Distribution model: the fold is sequential PER CLUSTER (the semantics
  * are order-sensitive by design); clusters are independent, so Spark
  * runs it as groupByKey(yuid) → sorted fold inside mapGroups — one
  * shuffle, perfectly parallel across clusters, no driver-side state.
  * Deliberate model simplifications (flattened nested paths, boolean
  * `estimated` instead of classification walk) are documented inline.
  */
object LaMerge {

  /** globals (reference `config.py:257-281` resolves these AAT terms). */
  val primaryNameId = "http://vocab.getty.edu/aat/300404670"
  val alternateNameId = "http://vocab.getty.edu/aat/300264273"
  val sortNameId = "http://vocab.getty.edu/aat/300451544"

  /** Name or Identifier (identified_by entry). `classifiedAs`/`languages`
    * carry ids only; labels are re-attached at export. */
  final case class LaName(ntype: String, content: String,
      classifiedAs: Seq[String], languages: Seq[String])

  /** referred_to_by entry: statement content, or an id-only reference. */
  final case class LaStatement(id: String, content: String)

  /** Dimension identity key per merger.py:358-378. */
  final case class LaDim(classId: String, value: Double, unitId: String)

  /** Four-point timespans flattened to the two the merger compares
    * (merger.py:553-556); `estimated` stands in for the classification
    * walk on rts.classified_as (merger.py:571-578). */
  final case class LaTimespan(begin: String, end: String, estimated: Boolean)

  /** One mergeable record. Reference-model paths flattened: subject_of /
    * representation are their access-point id lists (the dedupe keys the
    * reference extracts), contact points their content strings. */
  final case class LaRecord(
      id: String, rtype: String, label: String, source: String,
      identifiedBy: Seq[LaName],
      referredToBy: Seq[LaStatement],
      classifiedAs: Seq[String],
      equivalent: Seq[String],
      memberOf: Seq[String],
      subjectOfAps: Seq[String],
      representationAps: Seq[String],
      dimensions: Seq[LaDim],
      timespan: Option[LaTimespan],
      definedBy: String,
      partOf: Seq[String],
      residence: Seq[String],
      contactPoints: Seq[String],
      broader: Seq[String])

  object LaRecord {
    /** A minimal record: everything empty but identity. */
    def apply(id: String, rtype: String, label: String, source: String): LaRecord =
      LaRecord(id, rtype, label, source, Nil, Nil, Nil, Nil, Nil, Nil, Nil,
        Nil, None, null, Nil, Nil, Nil, Nil)
  }

  /** Source-pair veto config (J10). `protectedTypes` × `noisySources`
    * mirrors the YCBA rule: never merge a Wikidata record into an
    * object/work-ish base, in either direction (ycba/mapper.py:13-27). */
  final case class MergeConfig(
      internalSources: Set[String],
      protectedTypes: Set[String] =
        Set("HumanMadeObject", "LinguisticObject", "Set", "VisualItem"),
      noisySources: Set[String] = Set("wikidata"))

  private val specialTypes =
    Set("Language", "Material", "MeasurementUnit", "Currency")

  /** merger.py:683-694 — same type passes; Language/Material/
    * MeasurementUnit/Currency absorb Type (in either direction, keeping
    * the special class); anything else aborts the pair (None). */
  def resolveType(base: String, cand: String): Option[String] =
    if (base == cand) Some(base)
    else if (specialTypes(base) && cand == "Type") Some(base)
    else if (specialTypes(cand) && base == "Type") Some(cand)
    else None

  /** J10 (merger.py:926-958 via ycba/mapper.py:13-27): both directions of
    * the protected-type × noisy-source veto. */
  def shouldMerge(base: LaRecord, cand: LaRecord, cfg: MergeConfig): Boolean =
    !(cfg.protectedTypes(base.rtype) && cfg.noisySources(cand.source)) &&
      !(cfg.protectedTypes(cand.rtype) && cfg.noisySources(base.source))

  /** merger.py:557-565 — a [Y-01-01, (Y+1)-01-01] span really means "the
    * year Y": clamp the end to Y-12-31T23:59:59Z. */
  def fixEndOfYear(ts: LaTimespan): LaTimespan = {
    val b = Option(ts.begin).getOrElse("")
    val e = Option(ts.end).getOrElse("")
    val ok = b.length >= 10 && e.length >= 10 &&
      b.substring(5, 10) == "01-01" && e.substring(5, 10) == "01-01" &&
      (try b.take(4).toInt == e.take(4).toInt - 1
       catch { case _: NumberFormatException => false })
    if (ok) ts.copy(end = b.take(4) + "-12-31T23:59:59Z") else ts
  }

  /** Interval length in seconds; unparseable → Long.MaxValue on the
    * current side (merger.py:601-602 "rdelta = timedelta(100000)") and
    * None on the incoming side (merger.py:618 "mdelta = None"). */
  private def intervalSecs(ts: LaTimespan): Option[Long] =
    for {
      b <- DateLib.epochSeconds(Option(ts.begin).getOrElse(""))
      e <- DateLib.epochSeconds(Option(ts.end).getOrElse(""))
    } yield e - b

  /** merger.py:542-622: throw out an estimated current span; otherwise
    * keep the most specific (strictly smaller) interval. A zero-length
    * incoming span never replaces: `if mdelta and mdelta < rdelta`
    * (merger.py:622) treats timedelta(0) as falsy. */
  def mergeTimespan(cur: LaTimespan, inc: LaTimespan): LaTimespan = {
    val c = fixEndOfYear(cur)
    val m = fixEndOfYear(inc)
    if (c.estimated) m
    else {
      val cd = intervalSecs(c).getOrElse(Long.MaxValue)
      intervalSecs(m) match {
        case Some(md) if md > 0 && md < cd => m
        case _ => c
      }
    }
  }

  /** merger.py:750-842 — the identified_by fold. Dedupe key is
    * (ntype, trim-lower content); on a fresh content the incoming entry is
    * appended (stripping a would-be second primary from non-internal
    * sources); on an existing Name the classifications are arbitrated
    * (primary only if none yet and the match isn't an alternate; alternate
    * only if the match is neither primary nor alternate; sort and other
    * classifications added when absent) and languages unioned.
    * Deviation (documented): the reference appends sortName without a
    * presence check (merger.py:812-815), which can duplicate; we dedupe. */
  def mergeIdentifiedBy(recNames: Seq[LaName], incNames: Seq[LaName],
      incInternal: Boolean): Seq[LaName] = {
    var names = recNames.toVector
    var hasPrimary = names.exists(n =>
      n.ntype == "Name" && n.classifiedAs.contains(primaryNameId))
    for (i <- incNames) {
      val cont = Option(i.content).map(_.trim).getOrElse("")
      if (cont.nonEmpty) {
        val lower = cont.toLowerCase(java.util.Locale.ROOT)
        val idx = names.indexWhere(n => n.ntype == i.ntype &&
          Option(n.content).exists(_.trim.toLowerCase(java.util.Locale.ROOT) == lower))
        if (idx < 0) {
          val incomingPrimary = i.classifiedAs.contains(primaryNameId)
          val toAdd =
            if (incomingPrimary && hasPrimary && !incInternal)
              // a primary exists: strip the flag, UNLESS the incoming
              // record is internal (final mapper elects among those,
              // merger.py:776-786)
              i.copy(classifiedAs = i.classifiedAs.filterNot(_ == primaryNameId))
            else i
          if (incomingPrimary && !hasPrimary) hasPrimary = true
          names = names :+ toAdd
        } else if (i.ntype == "Name") {
          val main = names(idx)
          var mcx = main.classifiedAs
          for (ic <- i.classifiedAs) {
            if (ic == primaryNameId) {
              if (!hasPrimary && !mcx.contains(alternateNameId)) {
                mcx = mcx :+ primaryNameId; hasPrimary = true
              }
            } else if (ic == alternateNameId) {
              if (!mcx.contains(primaryNameId) && !mcx.contains(alternateNameId))
                mcx = mcx :+ alternateNameId
            } else if (!mcx.contains(ic)) mcx = mcx :+ ic
          }
          var mlang = main.languages
          for (l <- i.languages) if (!mlang.contains(l)) mlang = mlang :+ l
          names = names.updated(idx, main.copy(classifiedAs = mcx, languages = mlang))
        }
      }
    }
    names
  }

  /** merger.py:844-872 — statement dedupe by trimmed content (id-only
    * entries by id), with at most one additional "AI generated" statement
    * per step when the base already carries one (has_ai is computed at
    * step entry, exactly like the reference). */
  def mergeStatements(rec: Seq[LaStatement], inc: Seq[LaStatement]): Seq[LaStatement] = {
    var out = rec.toVector
    var conts = rec.flatMap(s => Option(s.content)).map(_.trim).toVector
    var ids = rec.flatMap(s => Option(s.id)).toVector
    val hasAi = conts.exists(_.contains("AI generated"))
    for (i <- inc) {
      if (i.content != null) {
        val c = i.content.trim
        if (!conts.contains(c) && !(hasAi && c.contains("AI generated"))) {
          out = out :+ i; conts = conts :+ c
        }
      } else if (i.id != null && !ids.contains(i.id)) {
        out = out :+ i; ids = ids :+ i.id
      }
    }
    out
  }

  /** id-set union preserving first-seen order (merger.py:892-898), with an
    * optional self-id exclusion (the broader/part_of rules exclude the
    * record's own id, merger.py:170-171, :246-252). */
  def unionIds(rec: Seq[String], inc: Seq[String],
      excludeSelf: Option[String] = None): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet(rec: _*)
    excludeSelf.foreach(seen.add)
    for (i <- inc) if (i != null) seen.add(i)
    val out = seen.toVector
    excludeSelf match {
      case Some(self) if !rec.contains(self) => out.filterNot(_ == self)
      case _ => out
    }
  }

  /** merger.py:358-378 — dimensions are identical iff (unit, value,
    * classification) all match. */
  def mergeDims(rec: Seq[LaDim], inc: Seq[LaDim]): Seq[LaDim] =
    inc.foldLeft(rec) { (acc, dm) =>
      if (acc.exists(dr => dr.unitId == dm.unitId && dr.value == dm.value &&
        dr.classId == dm.classId)) acc
      else acc :+ dm
    }

  /** One pair-merge step: merge_common + class dispatch. None = pair
    * aborted on type conflict (merger.py:691-694). Copy-if-absent
    * (merger.py:704-707) is modeled as empty-collection / null checks. */
  def mergeRecord(rec: LaRecord, inc: LaRecord, cfg: MergeConfig): Option[LaRecord] =
    resolveType(rec.rtype, inc.rtype).map { t =>
      val incInternal = cfg.internalSources(inc.source)
      val geom =
        if (rec.definedBy == null) inc.definedBy
        else if (t == "Place" && inc.definedBy != null)
          Wkt.better(rec.definedBy, inc.definedBy)
        else rec.definedBy
      rec.copy(
        rtype = t,
        label = if (rec.label == null) inc.label else rec.label,
        identifiedBy =
          if (rec.identifiedBy.isEmpty) inc.identifiedBy
          else mergeIdentifiedBy(rec.identifiedBy, inc.identifiedBy, incInternal),
        referredToBy =
          if (rec.referredToBy.isEmpty) inc.referredToBy
          else mergeStatements(rec.referredToBy, inc.referredToBy),
        classifiedAs =
          if (rec.classifiedAs.isEmpty) inc.classifiedAs
          else unionIds(rec.classifiedAs, inc.classifiedAs),
        equivalent =
          if (rec.equivalent.isEmpty) inc.equivalent
          else unionIds(rec.equivalent, inc.equivalent),
        memberOf =
          if (rec.memberOf.isEmpty) inc.memberOf
          else unionIds(rec.memberOf, inc.memberOf),
        subjectOfAps =
          if (rec.subjectOfAps.isEmpty) inc.subjectOfAps
          else unionIds(rec.subjectOfAps, inc.subjectOfAps),
        representationAps =
          if (rec.representationAps.isEmpty) inc.representationAps
          else unionIds(rec.representationAps, inc.representationAps),
        dimensions =
          if (rec.dimensions.isEmpty) inc.dimensions
          else mergeDims(rec.dimensions, inc.dimensions),
        timespan = (rec.timespan, inc.timespan) match {
          case (None, x) => x
          case (Some(c), Some(m)) => Some(mergeTimespan(c, m))
          case (x, None) => x
        },
        definedBy = geom,
        partOf =
          if (rec.partOf.isEmpty) inc.partOf
          else unionIds(rec.partOf, inc.partOf, Some(rec.id)),
        residence =
          if (rec.residence.isEmpty) inc.residence
          else unionIds(rec.residence, inc.residence),
        contactPoints =
          if (rec.contactPoints.isEmpty) inc.contactPoints
          else unionIds(rec.contactPoints.map(_.trim), inc.contactPoints.map(_.trim)),
        broader =
          if (rec.broader.isEmpty) inc.broader
          else unionIds(rec.broader, inc.broader, Some(rec.id)))
    }

  /** A3 pre_merge_fixes (merger.py:18-35): when the cluster is a Place and
    * any EXTERNAL record contributes part_of, every INTERNAL record's
    * part_of is dropped (externals carry the curated hierarchy). */
  def preMergeFixes(sorted: Seq[LaRecord], cfg: MergeConfig): Seq[LaRecord] =
    if (sorted.headOption.exists(_.rtype == "Place") &&
        sorted.exists(r => !cfg.internalSources(r.source) && r.partOf.nonEmpty))
      sorted.map(r => if (cfg.internalSources(r.source)) r.copy(partOf = Nil) else r)
    else sorted

  final case class MergedCluster(record: LaRecord, sources: Seq[String], nMerged: Int)

  /** Fold a merge_order-sorted cluster into one record (MergeHandler.merge,
    * merger.py:37-83 + :962-1024). Vetoed or type-conflicting candidates
    * are skipped, not fatal. A type-conflicting candidate contributes no
    * data but IS counted: the reference appends to_merge's source after
    * merge_common returns even when it aborted (merger.py:1007-1015);
    * only a should_merge veto leaves sources/n untouched. */
  def mergeCluster(sorted: Seq[LaRecord], cfg: MergeConfig): Option[MergedCluster] =
    sorted.headOption.map { base =>
      val fixed = preMergeFixes(sorted, cfg)
      var rec = fixed.head
      var sources = Vector(base.source)
      var n = 1
      for (cand <- fixed.tail) {
        if (shouldMerge(rec, cand, cfg)) {
          mergeRecord(rec, cand, cfg) match {
            case Some(m) => rec = m
            case None => () // type conflict: no data absorbed (merger.py:691-694)
          }
          sources = sources :+ cand.source
          n += 1
        }
      }
      MergedCluster(rec, sources, n)
    }
}
