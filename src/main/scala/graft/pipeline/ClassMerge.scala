package graft.pipeline

/** The per-class merge handlers of the reference's merger
  * (`pipeline/process/merger.py:107-330` — the class-specific rules
  * layered over merge_common, which lives in `operators/LaMerge`):
  *
  *   - `merge_type`'s influenced_by arbitration (`:109-160`): the two
  *     records' concept-component lists are compared PAIRWISE by
  *     position — a count mismatch keeps the base list wholesale;
  *     equal entries pass through; same id with differing labels
  *     elects the UPPERCASED label (else the base's), trimmed; same
  *     label with differing classes elects the more specific over
  *     bare `Type` (both specific → base wins); a pair missing an id,
  *     or differing in every dimension, contributes NOTHING (the
  *     reference's silent `pass` — the component is dropped);
  *   - union-by-id reference merging with the SELF-id guard
  *     (`:168-175,245-254`): broader/part_of/approximated_by/
  *     residence append only unseen ids, and the base record's own id
  *     is pre-seeded so a merge can never introduce a self-reference;
  *   - contact_point union by trimmed CONTENT (`:284-293`) — contacts
  *     are Identifiers, so textual equality is identity;
  *   - `merge_place`'s defined_by election (`:177-243`): parseable
  *     beats unparseable, both-unparseable DELETES the property,
  *     polygon beats point, polygon-vs-polygon elects more exterior
  *     coords then longer (more precise) first-coordinate text,
  *     point-vs-point elects precision, polygon never yields to a
  *     point. The GeoJSON FeatureCollection arm is handled upstream
  *     (m12's GeoJSON→WKT); precision compares the coordinate TEXT,
  *     matching shapely's str() for round-tripping decimals.
  *
  * Pure kernels for a `Dataset.map` merge stage, like LaMerge. */
object ClassMerge {

  final case class Concept(id: Option[String], label: String, typ: String)

  /** merge_type:109-160 — pairwise influenced_by arbitration. */
  def influencedBy(rc: Seq[Concept], mc: Seq[Concept]): Seq[Concept] = {
    if (mc.length != rc.length) return rc // count mismatch: keep base
    mc.zip(rc).flatMap { case (m, r) =>
      if (m == r) Some(r)
      else if (m.id.isEmpty || r.id.isEmpty) None // missing URI: dropped
      else if (m.id == r.id) {
        // label differs: elect the uppercased version, trimmed
        if (m.label.nonEmpty && m.label.head.isUpper)
          Some(m.copy(label = m.label.trim))
        else Some(r.copy(label = r.label.trim))
      } else if (m.label == r.label && m.typ != r.typ) {
        if (m.typ == "Type" && r.typ != "Type") Some(r)
        else if (r.typ == "Type" && m.typ != "Type") Some(m)
        else Some(r) // both specific: keep base arbitrarily (:152)
      } else None // the ??? arm: silently dropped (:155-158)
    }
  }

  /** Union-by-id with the self-id guard (:168-175): the base list is
    * untouched; incoming ids append only when unseen AND not the base
    * record's own id. */
  def unionById(rec: Seq[String], inc: Seq[String], selfId: String): Seq[String] = {
    val seen = scala.collection.mutable.Set(rec: _*)
    seen += selfId
    rec ++ inc.filter(i => i.nonEmpty && seen.add(i))
  }

  /** contact_point union by trimmed content (:284-293). */
  def unionByContent(rec: Seq[String], inc: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet(rec.map(_.trim): _*)
    for (c <- inc) seen += c.trim
    seen.toSeq
  }

  /** merge_activity's end_of_the_end fixup (`merger.py:558-563`): a
    * span written as [Y-01-01, (Y+1)-01-01] really means "the year Y",
    * so the end snaps back to Y-12-31T23:59:59Z. Unparseable years
    * leave the value alone (the reference's bare try). */
  def fixEndOfEnd(b: String, e: String): String = {
    try {
      if (e.nonEmpty && b.length >= 10 && e.length >= 10 &&
        b.substring(0, 4).toInt == e.substring(0, 4).toInt - 1 &&
        e.substring(5, 10) == "01-01" && b.substring(5, 10) == "01-01")
        s"${e.substring(0, 4).toInt - 1}-12-31T23:59:59Z"
      else e
    } catch { case _: NumberFormatException => e }
  }

  private val spanFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss")

  /** Span length in seconds, with the reference's normalizations:
    * trailing Z stripped, a leading `-` (BCE) stripped so the
    * ABSOLUTE year parses (`:586-593` — the rb_bc flag is set and
    * never read; ported faithfully). None when unparseable. */
  def spanSeconds(bRaw: String, eRaw: String,
      stripBce: Boolean = true): Option[Long] = {
    def clean(s: String) = {
      val z = if (s.nonEmpty && s.last == 'Z') s.dropRight(1) else s
      // merger.py BCE-strips the leading '-' on the RECORD side only
      // (`:586-593`); the merge side keeps it and fails strptime
      if (stripBce && z.nonEmpty && z.head == '-') z.tail else z
    }
    try {
      val b = java.time.LocalDateTime.parse(clean(bRaw), spanFmt)
      val e = java.time.LocalDateTime.parse(clean(eRaw), spanFmt)
      Some(java.time.Duration.between(b, e).getSeconds)
    } catch { case _: Exception => None }
  }

  private val HugeDelta = 100000L * 86400L // timedelta(100000) days

  /** merge_activity's timespan election (`:542-624`): an "estimated"/
    * "possibly" base yields wholesale; otherwise the most SPECIFIC
    * (shortest) span wins — an unparseable/missing base defaults to a
    * huge span (so any parseable merge beats it), an unparseable or
    * missing merge keeps the base. Returns true when the merge's
    * timespan should replace the base's. */
  def takeMergeTimespan(recEstimated: Boolean, rb: String, re: String,
      mb: String, me: String): Boolean = {
    if (recEstimated) return true
    val rdelta =
      if (rb.nonEmpty && re.nonEmpty) spanSeconds(rb, re).getOrElse(HugeDelta)
      else HugeDelta
    val mdelta =
      if (mb.nonEmpty && me.nonEmpty) spanSeconds(mb, me, stripBce = false)
      else None
    // `if mdelta and mdelta < rdelta`: Python's timedelta(0) is falsy,
    // so a zero-length merge span keeps the base
    mdelta.exists(d => d != 0L && d < rdelta)
  }

  private def kind(wkt: String): Option[String] =
    if (wkt.startsWith("POINT")) Some("POINT")
    else if (wkt.startsWith("POLYGON")) Some("POLYGON")
    else None

  /** First coordinate pair as text: ("x", "y"). */
  private def firstCoord(wkt: String): (String, String) = {
    val inner = wkt.dropWhile(_ != '(').dropWhile(_ == '(').trim
    val stop = inner.indexWhere(c => c == ',' || c == ')')
    val pair = (if (stop >= 0) inner.substring(0, stop) else inner).trim
    val Array(x, y) = pair.split("\\s+", 2)
    (x, y)
  }

  private def coordCount(wkt: String): Int =
    wkt.count(_ == ',') + 1

  private def morePrecise(a: String, b: String): Boolean = {
    val (ax, ay) = firstCoord(a); val (bx, by) = firstCoord(b)
    bx.length > ax.length || by.length > ay.length
  }

  /** merge_place:180-243 — Some(winner) or None to DELETE defined_by. */
  def placeDefinedBy(aRaw: String, bRaw: String): Option[String] = {
    val a = aRaw.trim; val b = bRaw.trim
    if (a == b) return Some(a)
    (kind(a), kind(b)) match {
      case (None, Some(_)) => Some(b)
      case (Some(_), None) => Some(a)
      case (None, None) => None // both unparseable: delete
      case (Some("POINT"), Some("POLYGON")) => Some(b)
      case (Some("POLYGON"), Some("POINT")) => Some(a) // :240 "Nope"
      case (Some("POLYGON"), Some("POLYGON")) =>
        if (coordCount(b) > coordCount(a)) Some(b)
        else if (morePrecise(a, b)) Some(b)
        else Some(a)
      case _ => // POINT vs POINT
        if (morePrecise(a, b)) Some(b) else Some(a)
    }
  }
}
