package graft.operators

import graft.operators.LaMerge.{LaName, LaRecord}

/** M13 — the final Cleaner (`pipeline/sources/lux/final/mapper.py`), the
  * post-merge normalization pass every merged record goes through:
  *
  *   - property dedupe by id (final/mapper.py:649-663)
  *   - webpage dedupe via URL normalization + variation sets (:713-776)
  *   - timespan open-end defaults (:665-676)
  *   - metatype injection from equivalents (:678-711)
  *   - PRIMARY/SORT-NAME ELECTION per language (:366-576): primary flag
  *     first; otherwise candidates excluding explicit alternates with
  *     unclassified names preferred, shortest content wins; sub-3-char
  *     Place names rotate to the back (:465-469); all-caps acronyms are
  *     demoted behind non-acronyms (:518-531); losing primaries are
  *     de-flagged (:533-541)
  *   - unnamed fallback: _label copy / "Unnamed <type>" (:578-612)
  *   - name display ordering by language score (en 100 > es 90 > fr 80 >
  *     de 70 > nl 60 > zh 50 > other 10 > none 0, +5 primary,
  *     +1 alternate; stable) (:617-646)
  *
  * The reference's LLM-parsed-name preference (llm_primaryname) is not
  * modeled — no LLM name source exists here; the non-LLM election path is
  * the one implemented. Languages are plain codes ("en") instead of
  * resolved YUIDs; each name carries its language list exactly like the
  * reference (a multi-language name is considered in every bucket).
  */
object Cleaner {

  val primaryNameId: String = LaMerge.primaryNameId
  val alternateNameId: String = LaMerge.alternateNameId
  val sortNameId: String = LaMerge.sortNameId
  val alternateTitleId = "http://vocab.getty.edu/aat/300417227"
  val translatedTitleId = "http://vocab.getty.edu/aat/300417194"
  val officialNameId = "http://vocab.getty.edu/aat/300404686"
  val metatypeClassLabel = "Metatype"

  private val langScore: Map[String, Int] =
    Map("en" -> 100, "es" -> 90, "fr" -> 80, "de" -> 70, "nl" -> 60, "zh" -> 50)

  /** :649-663 — keep the first occurrence of each id (empty ids pass). */
  def dedupeIds(ids: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    val keepEmpty = ids.filter(i => i == null || i.isEmpty)
    ids.filter(i => i != null && i.nonEmpty).foreach(seen.add)
    seen.toVector ++ keepEmpty
  }

  /** :713-720 — scheme default http, www. strip, trailing-slash strip,
    * query/fragment drop. */
  def normalizeUrl(url: String): String = {
    val (scheme, rest) = url.indexOf("://") match {
      case -1 => ("http", url)
      case i  => (url.substring(0, i), url.substring(i + 3))
    }
    val cut = rest.indexWhere(c => c == '?' || c == '#') match {
      case -1 => rest
      case i  => rest.substring(0, i)
    }
    val (host, path) = cut.indexOf('/') match {
      case -1 => (cut, "")
      case i  => (cut.substring(0, i), cut.substring(i))
    }
    s"$scheme://${host.replace("www.", "")}${path.reverse.dropWhile(_ == '/').reverse}"
  }

  /** :722-776 — first AP wins; later APs whose variation set (normalized,
    * scheme-swap, www-strip, slash-toggle) collides are dropped. Kept keys
    * are the NORMALIZED urls; a kept page whose original AP differs from
    * its normalized form is dropped with it (ws[k] KeyError → skip),
    * faithfully mirroring the reference. */
  def dedupeWebpages(aps: Seq[String]): Seq[String] = {
    if (aps.size < 2) return aps
    var okay = Vector.empty[String]
    for (a <- aps) {
      val norm = normalizeUrl(a)
      var variations = Vector(norm)
      if (a.startsWith("http://")) variations :+= a.replaceFirst("http://", "https://")
      else if (a.startsWith("https://")) variations :+= a.replaceFirst("https://", "http://")
      for (o <- variations) {
        variations :+= o.replaceFirst("//www\\.", "//")
        variations :+= (if (o.endsWith("/")) o.reverse.dropWhile(_ == '/').reverse
                        else o + "/")
      }
      if (!variations.exists(okay.contains)) okay :+= norm
    }
    okay.filter(aps.contains) // ws[k] lookup by original ap (:771-776)
  }

  /** :665-676 — open intervals default to the +/-9999 sentinels. */
  def timespanDefaults(begin: String, end: String): (String, String) =
    (Option(begin), Option(end)) match {
      case (Some(b), None) => (b, "9999-12-31T23:59:59")
      case (None, Some(e)) => ("-9999-01-01T00:00:00", e)
      case _ => (begin, end)
    }

  /** :678-711 — equivalents carrying metatypes inject classified_as ids. */
  def injectMetatypes(classifiedAs: Seq[String], equivalents: Seq[String],
      metatypes: Map[String, Seq[String]]): Seq[String] = {
    var out = classifiedAs.toVector
    for (eq <- equivalents; md <- metatypes.getOrElse(eq, Nil))
      if (!out.contains(md)) out :+= md
    out
  }

  private def isUpper(s: String): Boolean =
    s.exists(_.isLetter) && s.forall(c => !c.isLetter || c.isUpper)

  /** The per-language primary/sort-name election + display ordering over a
    * record's identified_by (:366-646). Returns the rewritten name list
    * (ordered for display) — or None when the record should be dropped
    * (the bad-DigitalObject rule, :589-595). */
  def electNames(recIn: LaRecord): Option[Seq[LaName]] = {
    // strip empty-content names (:378-388)
    val names = scala.collection.mutable.ArrayBuffer[LaName](
      recIn.identifiedBy.filter(n => n.ntype != "Name" ||
        Option(n.content).exists(_.trim.nonEmpty)): _*)

    def cls(i: Int): Seq[String] = names(i).classifiedAs
    def setCls(i: Int, c: Seq[String]): Unit =
      names(i) = names(i).copy(classifiedAs = c)
    // Python's `del nm["classified_as"]` (:530) vs an EMPTY-BUT-PRESENT
    // list: both read as "no classes" everywhere EXCEPT the sort
    // fallback's key-presence guard (:574). The Seq model can't carry
    // the distinction, so deletion is tracked here: marked by the
    // len==1 de-flag, cleared when an election recreates the key
    // (:480-485, :488-502 both materialize it).
    val deletedCls = scala.collection.mutable.Set[Int]()

    // language buckets in first-seen order; None bucket key = ""
    val buckets = scala.collection.mutable.LinkedHashMap[String, Vector[Int]]()
    for (i <- names.indices if names(i).ntype == "Name") {
      val langs = if (names(i).languages.isEmpty) Seq("") else names(i).languages
      for (l <- langs) buckets(l) = buckets.getOrElse(l, Vector.empty) :+ i
    }

    val sortNameLangs = scala.collection.mutable.LinkedHashMap[String, Vector[Int]]()
    val primaryNameLangs = scala.collection.mutable.LinkedHashMap[String, Int]()

    for ((lang, nms) <- buckets) {
      var primaryVals = Vector.empty[Int]
      for (i <- nms) {
        val c = cls(i)
        if (c.contains(primaryNameId) && c.contains(alternateNameId)) {
          // both flags: first becomes primary, later ones alternate
          // (:405-423). The Python scans for the FIRST matching entry
          // and list.remove()s exactly that one — a record carrying the
          // flag twice (e.g. [P,P,A] via the :480+485 overwrite) keeps
          // the second copy; filterNot would strip them all (advice r15)
          def removeFirst(flag: String): Seq[String] =
            c.patch(c.indexOf(flag), Nil, 1)
          if (primaryVals.nonEmpty) setCls(i, removeFirst(primaryNameId))
          else { setCls(i, removeFirst(alternateNameId)); primaryVals :+= i }
        } else if (c.contains(primaryNameId)) primaryVals :+= i
        if (c.contains(sortNameId))
          sortNameLangs(lang) = sortNameLangs.getOrElse(lang, Vector.empty) :+ i
      }

      if (primaryVals.isEmpty) {
        // candidate selection (:434-469)
        var candidates =
          if (nms.size == 1) nms
          else {
            var cands = Vector.empty[Int]
            var break = false
            for (i <- nms if !break) {
              val c = cls(i)
              if (c.isEmpty) cands = i +: cands // unclassified preferred (:444-445)
              else if (c.contains(officialNameId)) { cands = Vector(i); break = true }
              else if (!Seq(alternateNameId, alternateTitleId, translatedTitleId)
                .exists(c.contains)) cands :+= i
            }
            cands.sortBy(i => names(i).content.length) // stable
          }
        if (candidates.size > 1 && recIn.rtype == "Place" &&
            names(candidates.head).content.length < 3)
          candidates = candidates.tail :+ candidates.head // :465-469
        val target =
          if (candidates.isEmpty) {
            // everything was an alternate: overwrite (:471-485). The
            // reference DOUBLE-flags here — :480 replaces classified_as
            // with [primary] inside the loop, and the append at :485 is
            // UNCONDITIONAL (outside the `if not done` guard), so the
            // promoted name carries TWO primary entries in the output.
            // Found by the w2b differential's oracle construction;
            // faithfully reproduced, not cleaned up.
            val t = nms.head
            val c = cls(t)
            if (Seq(alternateNameId, alternateTitleId, translatedTitleId).exists(c.contains))
              setCls(t, Seq(primaryNameId, primaryNameId))
            else setCls(t, c :+ primaryNameId)
            deletedCls -= t // :480/:483-485 recreate the key
            t
          } else {
            val t = candidates.head
            setCls(t, cls(t).filterNot(c =>
              c == alternateNameId || c == alternateTitleId) :+ primaryNameId)
            deletedCls -= t // :488-502 recreate the key
            t
          }
        primaryNameLangs(lang) = target
      } else if (primaryVals.size > 1) {
        // pick shortest; Place sub-3 rotation; acronym demotion (:507-541)
        var pv = primaryVals.sortBy(i => names(i).content.length) // stable
        if (recIn.rtype == "Place" && names(pv.head).content.length < 3)
          pv = pv.tail :+ pv.head
        if (isUpper(names(pv.head).content)) {
          val (acrs, other) = pv.partition(i => isUpper(names(i).content))
          pv = other ++ acrs
        }
        for (i <- pv.tail) {
          // :529-538 — a loser whose ONLY class is the primary has the
          // whole key DELETED (len==1 branch); one with more keeps the
          // rest, and a doubled [P,P] (the :480+485 overwrite) strips
          // to an empty-but-PRESENT list — the distinction :574 reads
          if (cls(i).size == 1) { setCls(i, Nil); deletedCls += i }
          else setCls(i, cls(i).filterNot(_ == primaryNameId))
        }
        primaryNameLangs(lang) = pv.head
      } else primaryNameLangs(lang) = primaryVals.head
    }

    // sort-name election (:545-576)
    if (sortNameLangs.nonEmpty) {
      val winner =
        if (sortNameLangs.size == 1) sortNameLangs.head._2.head
        else sortNameLangs.get("en").map(_.head)
          .orElse(sortNameLangs.get("").map(_.head))
          .getOrElse(sortNameLangs.head._2.head)
      for ((_, v) <- sortNameLangs; i <- v if i != winner)
        setCls(i, cls(i).filterNot(_ == sortNameId))
    } else {
      // :563-575 — the append is guarded by `if "classified_as" in
      // target` (:574): a recorded primary whose flag was stripped by a
      // LATER language bucket's election takes the len==1 branch at
      // :530, which DELETES the key, so the reference silently skips
      // the sort flag — while a doubled-primary loser (the :480+485
      // overwrite) strips to an empty-but-PRESENT list and still
      // receives it. deletedCls carries exactly that distinction.
      // Found by the w2b differential's oracle construction.
      primaryNameLangs.get("en").orElse(primaryNameLangs.get(""))
        .orElse(primaryNameLangs.headOption.map(_._2))
        .foreach(i => if (!deletedCls(i)) setCls(i, cls(i) :+ sortNameId))
    }

    // fallback AFTER election (:578-612), so the injected name never gains
    // a sort name; it fires only when identified_by is entirely empty — a
    // record holding only Identifiers keeps them and gets no fallback.
    if (names.isEmpty) {
      if (recIn.label != null && recIn.label.nonEmpty)
        names += LaName("Name", recIn.label, Seq(primaryNameId), Nil)
      else if (recIn.rtype == "DigitalObject") return None // bad record (:589-595)
      else names += LaName("Name", s"Unnamed ${recIn.rtype}", Seq(primaryNameId), Nil)
    }

    // display ordering (:617-646); Scala sortBy is stable like Python's
    def score(n: LaName): Int = {
      if (n.ntype == "Identifier") return 0
      val t = n.languages.flatMap(langScore.get).maxOption
        .getOrElse(if (n.languages.nonEmpty) 10 else 0)
      t + (if (n.classifiedAs.contains(primaryNameId)) 5
           else if (n.classifiedAs.contains(alternateNameId)) 1 else 0)
    }
    Some(names.toVector.sortBy(n => -score(n)))
  }

  /** The full Cleaner pass over a merged record (transform, :778-908). */
  def clean(rec: LaRecord, metatypes: Map[String, Seq[String]] = Map.empty): Option[LaRecord] = {
    val deduped = rec.copy(
      classifiedAs = dedupeIds(rec.classifiedAs),
      memberOf = dedupeIds(rec.memberOf),
      partOf = dedupeIds(rec.partOf))
    val paged =
      if (Seq("Person", "Group", "Place").contains(deduped.rtype))
        deduped.copy(subjectOfAps = dedupeWebpages(deduped.subjectOfAps))
      else deduped
    val ts = paged.timespan.map { t =>
      val (b, e) = timespanDefaults(t.begin, t.end)
      t.copy(begin = b, end = e)
    }
    val meta = paged.copy(timespan = ts,
      classifiedAs = injectMetatypes(paged.classifiedAs, paged.equivalent, metatypes))
    electNames(meta).map(nms => meta.copy(identifiedBy = nms))
  }
}
