package graft.pipeline

/** The long-tail per-source mappers NOT yet covered by a dedicated
  * exemplar — ashmol, homosaurus, gbif, wikimedia and ror, each ported
  * as a pure per-record kernel with its named quirks:
  *
  *   - ashmol (`museums/ashmol/mapper.py:17-24`, 24 LoC): HMO records
  *     get the Collection Item classification APPENDED to whatever
  *     classifications exist;
  *   - homosaurus (`authorities/homosaurus/mapper.py:26-46`, 63 LoC):
  *     exactMatch ids append UNCONDITIONALLY (duplicates kept),
  *     closeMatch dedupes against the accumulated list;
  *   - gbif (`authorities/gbif/mapper.py:38-53`, 96 LoC): the name
  *     fallback chain — canonical + vernacular; scientificName only
  *     when BOTH are absent; the record's own rank column as last
  *     resort. Three-letter description languages route through
  *     lang_three_to_two (`base/mapper.py:47-120`) before the
  *     process_langs gate; alt-id sources map to wikidata
  *     classifications only when known;
  *   - wikimedia (`general/wikimedia/mapper.py:31-88`, 92 LoC): the
  *     license allowlist and raster-extension gates, the File: title
  *     strip, the Special:Filepath URI, and the credit-line assembly
  *     `<span>{name|title}[ by artist][ credit], {link|license}</span>`;
  *   - ror (`general/ror/mapper.py:19-99`, 104 LoC): bare `name`
  *     promotes into `names` only when the key is ABSENT (an empty
  *     list blocks it), labels always append; ror_display names are
  *     primary, aliases are skipped, everything else is a plain name;
  *     ISNI/Wikidata external ids mint prefixed equivalents, unknown
  *     types are dropped; parent relationships (case-insensitive)
  *     become member_of.
  */
object SmallSources {

  /** ashmol: Collection Item appended for HMOs (`:17-24`). */
  def ashmolClasses(recType: String, classes: Seq[String]): Seq[String] =
    if (recType == "HumanMadeObject")
      classes :+ "http://vocab.getty.edu/aat/300404024"
    else classes

  /** homosaurus: exact kept verbatim (dupes included), close deduped
    * against the accumulated list (`:26-46`). */
  def homosaurusSames(exact: Seq[String], close: Seq[String]): Seq[String] = {
    val sames = scala.collection.mutable.ArrayBuffer.empty[String]
    sames ++= exact
    for (c <- close if !sames.contains(c)) sames += c
    sames.toSeq
  }

  /** gbif name fallback chain (`:38-53`): first is primary, rest are
    * alternates. */
  def gbifNames(canonical: String, vernacular: String,
      scientific: String, rankValue: String): Seq[String] = {
    var names = Seq(canonical, vernacular).filter(_.nonEmpty)
    if (names.isEmpty) names = Seq(scientific).filter(_.nonEmpty)
    if (names.isEmpty) names = Seq(rankValue).filter(_.nonEmpty)
    names
  }

  /** gbif taxonomic-rank classifications (`:8-21`) — public wikidata
    * entities. */
  val gbifRankTypes: Map[String, String] = Map(
    "kingdom" -> "http://www.wikidata.org/entity/Q36732",
    "phylum" -> "http://www.wikidata.org/entity/Q38348",
    "class" -> "http://www.wikidata.org/entity/Q37517",
    "order" -> "http://www.wikidata.org/entity/Q36602",
    "family" -> "http://www.wikidata.org/entity/Q35409",
    "genus" -> "http://www.wikidata.org/entity/Q34740",
    "species" -> "http://www.wikidata.org/entity/Q7432")

  /** The 639-2→639-1 slice relevant to process_langs
    * (`base/mapper.py:47-120` — bibliographic AND terminological forms). */
  val langThreeToTwo: Map[String, String] = Map(
    "eng" -> "en", "fra" -> "fr", "fre" -> "fr", "deu" -> "de",
    "ger" -> "de", "spa" -> "es", "zho" -> "zh", "chi" -> "zh",
    "rus" -> "ru", "jpn" -> "ja", "por" -> "pt", "ita" -> "it",
    "nld" -> "nl", "dut" -> "nl")

  /** gbif description language (`:66-71`): three-letter codes route
    * through the table first — an unknown three-letter code becomes
    * None (not itself) — then the process_langs gate. */
  def gbifLang(dlang: String): Option[String] = {
    val two = if (dlang.length == 3) langThreeToTwo.get(dlang) else Some(dlang)
    two.filter(LcNames.processLangs)
  }

  /** gbif alt-id source (`:22-28,81-92`): known sources classify, the
    * rest fall back to an attribute-assignment note. */
  val gbifAltidTypes: Map[String, String] = Map(
    "World Register of Marine Species" -> "http://www.wikidata.org/entity/Q604063",
    "The Paleobiology Database" -> "http://www.wikidata.org/entity/Q17073815",
    "Catalogue of Life Checklist" -> "http://www.wikidata.org/entity/Q38840")
  def gbifAltidRoute(source: String): (String, String) =
    gbifAltidTypes.get(source) match {
      case Some(uri) => ("classified_as", uri)
      case None      => ("assigned_by", source)
    }

  /** wikimedia license + extension gates (`:31-46`): Some((title,
    * filepath URI)) when usable. */
  val wmAllowedLicenses: Set[String] =
    Set("pd", "cc0", "cc-by-sa-4.0", "cc-by-4.0")
  private val wmExts = Seq(".jpg", ".jpeg", ".gif", ".png")
  def wmImage(license: String, title: String): Option[(String, String)] = {
    if (license.isEmpty || !wmAllowedLicenses(license)) None
    else {
      val t = if (title.startsWith("File:")) title.substring(5) else title
      val tl = t.toLowerCase(java.util.Locale.ROOT)
      if (!wmExts.exists(tl.endsWith))
        None
      else
        Some((t, s"https://commons.wikimedia.org/wiki/Special:Filepath/$t"))
    }
  }

  /** wikimedia's soup.get_text analog: tags stripped, newlines to
    * spaces, trimmed (`:50-52`). */
  def wmClean(html: String): String =
    html.replaceAll("<[^>]*>", "").replace("\n", " ").trim

  /** The credit line (`:76-88`). */
  def wmCredit(cleanName: String, title: String, artist: String,
      credit: String, licUrl: String, licShort: String,
      licName: String): String = {
    val cname = if (cleanName.nonEmpty) cleanName else title
    val a = if (artist.nonEmpty) s" by $artist" else ""
    val c = if (credit.nonEmpty) s" $credit" else ""
    val ltxt =
      if (licUrl.nonEmpty) s"""<a href="$licUrl">$licShort</a>""" else licName
    s"<span>$cname$a$c, $ltxt</span>"
  }

  /** ror name record: (value, types, lang). */
  final case class RorName(value: String, types: Seq[String],
      lang: Option[String])

  /** ror name normalization + role election (`:19-49`). `names = None`
    * models the ABSENT key: only then does the bare `name` promote; an
    * empty present list blocks it (and downstream yields no names).
    * Labels always append. Returns (value, role, gated lang). */
  def rorNames(name: Option[String], names: Option[Seq[RorName]],
      labels: Seq[(String, Option[String])]): Seq[(String, String, Option[String])] = {
    val base = names.getOrElse(
      name.map(RorName(_, Seq("ror_display"), None)).toSeq)
    val all = base ++ labels.map { case (v, l) => RorName(v, Nil, l) }
    all.flatMap { n =>
      val role =
        if (n.types.contains("ror_display")) Some("primary")
        else if (!n.types.contains("alias")) Some("name")
        else None
      role.map(r => (n.value, r, n.lang.filter(LcNames.processLangs)))
    }
  }

  /** ror established year → four-point span + display (`:51-59`);
    * the year renders unpadded, exactly as the reference's f-string. */
  def rorEstablished(year: Option[Int]): Option[(String, String, String)] =
    year.map(b => (s"$b-01-01T00:00:00", s"$b-12-31T23:59:59", b.toString))

  /** ror external ids (`:85-91`): only ISNI/Wikidata mint equivalents. */
  private val rorKnownTypes = Map("ISNI" -> "isni", "Wikidata" -> "wd")
  def rorExternal(ids: Seq[(String, Seq[String])]): Seq[String] =
    for {
      (typ, all) <- ids
      prefix <- rorKnownTypes.get(typ).toSeq
      a <- all
    } yield prefix + a

  /** ror relationships (`:94-97`): parent (case-insensitive) →
    * member_of. */
  def rorParents(rels: Seq[(String, String)]): Seq[String] =
    rels.collect { case (t, id) if t.toLowerCase(java.util.Locale.ROOT) == "parent" => id }
}
