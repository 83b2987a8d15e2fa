package graft.pipeline

import graft.functions.DateLib

/** BNE (Biblioteca Nacional de España) mapper core — exemplar port of
  * `pipeline/sources/libraries/bne/mapper.py` (250 LoC):
  *
  *   - guess_type (`:13-28`): the geográficos inScheme wins over
  *     @type — a skos:Concept in the geographic scheme is a Place,
  *     not a Type; C1005 → Person, C1006 → Group (Entidad
  *     Corporativa); anything else is unmapped;
  *   - label dedupe quirk (`:31-65`): `dupes` is REBUILT on every
  *     prefLabel iteration (`dupes = {preflbl: 1}`), so only the LAST
  *     prefLabel guards the altLabel list — an alt equal to an earlier
  *     pref is emitted, one equal to the last pref is dropped; alts
  *     then accumulate into the guard (alt-alt first-seen dedupe).
  *     Languages attach only when process_langs maps them;
  *   - person equivalents (`:147-160`): (P5024 ∖ sameAs) ++ sameAs,
  *     then (∖ seeAlso) ++ seeAlso — a move-to-end dedupe;
  *   - person dates (`:162-196`): a two-element P5010 is
  *     [birth, death]; its second element backs the death date ONLY
  *     when P5011 is absent, and the death display name is the raw
  *     P5011 even then (empty on the fallback path — quirk ported).
  *     Birth exists whenever P5010 is present (bounds empty if the
  *     date fails to parse); death exists only when a date parses;
  *   - gender (`:199-206`): Masculino/Femenino map to the canonical
  *     male/female instances, anything else passes through as an
  *     ident;
  *   - test_birth_death (`mapper_utils.py:146-197`): an implausible
  *     lifespan (longer than ~122 years or death before birth) clears
  *     BOTH events.
  *
  * Pure per-record functions for a `Dataset.map` stage, like the other
  * mapper exemplars. */
object BneMap {

  /** guess_type (`:13-28`) — inScheme checked FIRST. */
  def guessType(typeUri: String, inScheme: String): Option[String] =
    if (inScheme == "https://datos.bne.es/def/geograficos") Some("Place")
    else if (typeUri == "http://www.w3.org/2004/02/skos/core#Concept") Some("Type")
    else if (typeUri == "https://datos.bne.es/def/C1005") Some("Person")
    else if (typeUri == "https://datos.bne.es/def/C1006") Some("Group")
    else None

  final case class Name(content: String, lang: Option[String], primary: Boolean)

  /** handle_common's pref/alt emission with the last-pref guard quirk
    * (`:31-65`). Pref languages gate through process_langs; alt
    * languages only attach when present AND mapped. */
  def labels(prefs: Seq[(String, String)],
      alts: Seq[(String, Option[String])]): Seq[Name] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Name]
    // dupes = {preflbl: 1} is reassigned per iteration — even for an
    // empty label — so only the LAST prefLabel survives as the guard
    var guard = Set.empty[String]
    for ((c, l) <- prefs) {
      guard = Set(c)
      if (c.nonEmpty)
        out += Name(c, Some(l).filter(LcNames.processLangs), primary = true)
    }
    for ((c, l) <- alts) {
      if (c.nonEmpty && !guard(c)) {
        guard += c
        out += Name(c, l.filter(LcNames.processLangs), primary = false)
      }
    }
    out.toSeq
  }

  /** Person equivalent ordering (`:147-160`): move-to-end dedupe. */
  def personSames(p5024: Seq[String], sameAs: Seq[String],
      seeAlso: Seq[String]): Seq[String] = {
    val s1 = p5024.filterNot(sameAs.contains) ++ sameAs
    (s1.filterNot(seeAlso.contains) ++ seeAlso).filter(_.nonEmpty)
  }

  /** (begin, end, display) with "" for unparsed bounds. */
  final case class EventSpan(begin: String, end: String, display: String)

  /** P5010/P5011 (`:162-196`). Birth: present whenever dob is; bounds
    * set only when the date parses; display is the raw dob (the
    * two-element form displays as the pair, like Python's str of the
    * list). Death: dod wins, else the second dob element; created only
    * when a date PARSES; display is always the raw dod — empty on the
    * fallback path. */
  def personDates(dob: Seq[String], dod: Option[String])
      : (Option[EventSpan], Option[EventSpan]) = {
    val (bRaw, dFallback) = dob match {
      case Seq(b0, d0) => (Some(b0), Some(d0))
      case Seq(b0)     => (Some(b0), None)
      case _           => (None, None)
    }
    val birth = bRaw.map { b =>
      val span = DateLib.makeDatetime(b)
      val display = if (dob.length == 2) dob.mkString("[", ", ", "]") else b
      EventSpan(span.map(_.begin).getOrElse(""),
        span.map(_.end).getOrElse(""), display)
    }
    val dParse = dod.filter(_.nonEmpty).orElse(dFallback)
      .flatMap(DateLib.makeDatetime(_))
    val death = dParse.map(r =>
      EventSpan(r.begin, r.end, dod.getOrElse("")))
    (birth, death)
  }

  /** Gender classification (`:199-206`). */
  def gender(g: String): Option[String] = g match {
    case ""          => None
    case "Masculino" => Some("male")
    case "Femenino"  => Some("female")
    case other       => Some(s"gender:$other")
  }

  /** test_birth_death applied to the mapped events
    * (`mapper_utils.py:146-197` via `mapper.py:238-246`): implausible
    * lifespans clear BOTH events. Missing bounds pass. */
  def checkLifespan(birth: Option[EventSpan], death: Option[EventSpan])
      : (Option[EventSpan], Option[EventSpan]) = {
    val ok = (birth, death) match {
      case (Some(b), Some(d)) if b.begin.nonEmpty && d.end.nonEmpty =>
        DateLib.plausibleLifespan(b.begin, d.end)
      case _ => true
    }
    if (ok) (birth, death) else (None, None)
  }
}
