package graft.pipeline

/** GeoNames mapper core — exemplar port of
  * `pipeline/sources/general/geonames/mapper.py` (the TSV/RDF LOADER is
  * covered by `sources/Geonames` + `s5_geonames_tsv`; this covers the
  * mapper's record semantics):
  *
  *   - Place-only gate (`:25-27`): any other requested class maps to
  *     nothing (guess_type is unconditionally Place, `:20-22`);
  *   - JSON passthrough branch (`:30-35`): a record whose data is
  *     already parsed JSON passes through iff it carries an id and
  *     type == Place, else drops;
  *   - identifier normalization (`:44-46`, `:131-133`): both the
  *     rdf:about id and the cache identifier strip ONE trailing slash;
  *   - the language gate (`:69-84`): officialName → primary-name bucket
  *     per xml:lang (later same-lang officialName overwrites, it's a
  *     dict assignment), alternateName → alternate list per lang;
  *     entries with a language tag outside process_langs are dropped
  *     ENTIRELY (contrast LcNames, which keeps the name and drops only
  *     the tag); an untagged entry always passes ('' bucket);
  *   - label election (`:86-100`): gn:name wins; else en official >
  *     en alternate > untagged official > first official > first
  *     alternate (reference dict order = insertion order, modeled with
  *     ordered Seqs);
  *   - geometry (`:117-120`): `POINT ( lng lat )` — spaces inside BOTH
  *     parens, lng first, verbatim reference rendering (note the
  *     different spacing from WofMap.pointWkt);
  *   - part_of election (`:121-126`): ALL parentFeature refs when any
  *     exist, else ALL parentCountry refs — feature presence suppresses
  *     country entirely, they never mix;
  *   - equivalents (`:127-129`): every rdfs:seeAlso minted as an
  *     equivalent Place carrying the ELECTED label.
  */
object GeonamesMap {

  /** Langs the build processes (config.process_langs analog — the same
    * gate set the other source mappers use). */
  val processLangs: Set[String] = LcNames.processLangs

  /** Only Place records map (`:25-27`). */
  def mapsType(rectype: String): Boolean = rectype == "Place"

  /** JSON passthrough gate (`:30-35`). */
  def passthroughOk(hasId: Boolean, dtype: String): Boolean =
    hasId && dtype == "Place"

  /** Trailing-slash strip (`:44-46`). */
  def fixIdentifier(id: String): String =
    if (id.endsWith("/")) id.dropRight(1) else id

  /** The language gate (`:72-84`): keep untagged or processed langs. */
  def langOk(lang: String): Boolean = lang.isEmpty || processLangs(lang)

  /** officialName fold (`:69-75`): later same-lang entries OVERWRITE
    * (dict assignment); order of first appearance is preserved. */
  def foldOfficial(entries: Seq[(String, String)]): Seq[(String, String)] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    for ((lang, txt) <- entries if langOk(lang)) out(lang) = txt
    out.toSeq
  }

  /** alternateName fold (`:77-84`): append per lang. */
  def foldAlternate(entries: Seq[(String, String)]): Seq[(String, Seq[String])] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Vector[String]]()
    for ((lang, txt) <- entries if langOk(lang))
      out(lang) = out.getOrElse(lang, Vector.empty) :+ txt
    out.toSeq
  }

  /** Label election (`:86-100`): gn:name > en official > en alternate >
    * untagged official > first official > first alternate > None. */
  def electName(name: Option[String], pnames: Seq[(String, String)],
      anames: Seq[(String, Seq[String])]): Option[String] =
    name
      .orElse(pnames.collectFirst { case ("en", v) => v })
      .orElse(anames.collectFirst { case ("en", vs) if vs.nonEmpty => vs.head })
      .orElse(pnames.collectFirst { case ("", v) => v })
      .orElse(pnames.headOption.map(_._2))
      .orElse(anames.headOption.flatMap(_._2.headOption))

  /** Reference WKT rendering (`:117-120`), spacing verbatim. */
  def pointWkt(lat: String, lng: String): String = s"POINT ( $lng $lat )"

  /** part_of election (`:121-126`). */
  def parents(parentFeature: Seq[String], parentCountry: Seq[String]): Seq[String] =
    if (parentFeature.nonEmpty) parentFeature else parentCountry
}
