package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.MlMapper
import graft.pipeline.MlMapper._

/** M14: the search-index mapper as oracle-checked queries. Records are
  * synthesized deterministically from `customer` keys (8 record types,
  * each exercising its branch of the rule engine) and pushed through the
  * pure MlMapper inside a typed Dataset.flatMap/map — the per-source
  * mapper shape: map-only, shuffle-free, embarrassingly parallel. The
  * oracles replay the full triple/facet decision tree as UNION ALL /
  * CASE SQL over the same modular arithmetic. */
object MlIndexQueries extends QueryGroup {

  private val I = MlMapper.InternalPfx

  /** refCtr exclusion list (the globals analog, mapper.py:47-71). */
  val Excludes: Set[String] = Set(I + "a0", I + "p0")

  private val rtypes = Array("HumanMadeObject", "Person", "Group", "Place",
    "Type", "LinguisticObject", "DigitalObject", "VisualItem")

  /** The deterministic fixture record for customer key ck. */
  private[graft] def fixture(ck: Long): MlRecord = {
    val t = (ck % 8).toInt
    val rtype = rtypes(t)
    val a = Ref(I + "a" + (ck % 50))
    val p = I + "p" + (ck % 30)
    val baseCls = if (ck % 3 == 0) Seq(Cls("aat:cls" + (ck % 20))) else Nil
    val cls = t match {
      case 1 => baseCls ++
        (if (ck % 5 != 0) Seq(Cls("aat:nat" + (ck % 5), Seq(NationalityMeta))) else Nil) ++
        (if (ck % 7 == 0) Seq(Cls("aat:gen" + (ck % 3), Seq(GenderMeta))) else Nil)
      case 2 => baseCls ++
        (if (ck % 5 == 0) Seq(Cls("aat:occ" + (ck % 4), Seq(OccupationMeta))) else Nil)
      case _ => baseCls
    }
    val events: Map[String, Event] = t match {
      case 0 => Map("produced_by" -> Event(
        carried_out_by = Seq(a),
        took_place_at = if (ck % 3 == 0) Seq(Ref(p)) else Nil,
        technique = if (ck % 5 == 0) Seq(Ref("aat:tech" + (ck % 10))) else Nil,
        influenced_by = if (ck % 9 == 0)
          Seq(Ref(I + "i" + (ck % 40), if (ck % 5 != 0) "Person" else null)) else Nil,
        part = if (ck % 7 == 0) Seq(EventPart(
          carried_out_by = Seq(Ref(I + "a" + ((ck + 1) % 50))),
          attributed_by = if (ck % 3 == 0) Seq(Attribution(Seq(Assigned(
            took_place_at = Seq(Ref(I + "p" + ((ck + 2) % 30))))))) else Nil)) else Nil,
        attributed_by = if (ck % 5 == 0) Seq(Attribution(Seq(Assigned(
          carried_out_by = Seq(Ref(I + "a" + ((ck + 3) % 50))))))) else Nil))
      case 1 =>
        (if (ck % 3 != 0) Map("born" -> Event(took_place_at = Seq(Ref(p)))) else Map.empty[String, Event]) ++
        (if (ck % 5 == 0) Map("died" -> Event(took_place_at = Seq(Ref(I + "p" + ((ck + 1) % 30))))) else Map.empty) ++
        (if (ck % 7 == 0) Map("carried_out" -> Event(
          classified_as = Seq(ActiveMeta, "aat:job" + (ck % 6)),
          took_place_at = Seq(Ref(I + "p" + ((ck + 2) % 30))))) else Map.empty)
      case 2 =>
        if (ck % 3 == 0) Map("formed_by" -> Event(carried_out_by = Seq(a)))
        else Map.empty
      case 5 => Map("created_by" -> Event(
        carried_out_by = Seq(a),
        influenced_by = if (ck % 9 == 0) Seq(Ref(I + "i" + (ck % 40), "Place")) else Nil))
      case _ => Map.empty
    }
    // about targets are REAL record ids (always a Person-type key:
    // 8k+1) so LUX relationship hops over the substrate resolve; the
    // inline type annotation still varies to exercise all three
    // about_* prefix branches (the reference trusts the inline type the
    // same way, mapper.py:590-607)
    val aboutRef =
      Ref(I + "r" + (8 * (ck % 150) + 1),
        if (ck % 3 == 0) "Person" else if (ck % 3 == 1) null else "Place")
    MlRecord(
      id = I + "r" + ck,
      rtype = rtype,
      classified_as = cls,
      identified_by = if (ck % 11 == 0) Seq(Identifier("ils:yul:mfhd:" + ck)) else Nil,
      events = events,
      member_of = if (ck % 9 == 0) Seq(I + "s" + (ck % 15)) else Nil,
      equivalent = if (ck % 7 == 0) Seq("http://vocab.getty.edu/x" + ck) else Nil,
      carries = if (t == 0 && ck % 3 == 1) Seq(I + "w" + (ck % 25)) else Nil,
      made_of = if (t == 0 && ck % 5 == 0) Seq("aat:mat" + (ck % 6)) else Nil,
      digitally_carries = if (t == 6 && ck % 3 == 0) Seq(I + "lo" + (ck % 12)) else Nil,
      about = if (t == 5 || t == 7) Seq(aboutRef) else Nil,
      represents = if (t == 7 && ck % 5 == 0) Seq(Ref(I + "rp" + (ck % 21), "Place")) else Nil,
      language = if (t == 5 && ck % 3 == 0) Seq("lang:en") else Nil,
      part_of =
        if (t == 3) Seq(I + "p" + ((ck + 5) % 30))
        else if (t == 5 && ck % 5 == 0) Seq(I + "lo" + (ck % 12)) else Nil,
      broader = if (t == 4 && ck % 3 != 1) Seq(I + "t" + (ck % 9)) else Nil,
      access_point = if (t == 6 && ck % 5 == 0) Seq("https://ex.org/f" + ck) else Nil,
      representation = if (ck % 3 == 1)
        Seq(Representation(Seq(DigRef(Seq("https://img.example/" + ck))))) else Nil,
      subject_of = if (ck % 5 == 0) Seq(SubjectOf(Seq(DigRef(Seq(
        if (ck % 10 == 0) "https://search.library.yale.edu/cat" + ck
        else "https://pages.example/" + ck))))) else Nil,
      subject_to_class = if (ck % 7 == 0)
        Seq("https://creativecommons.org/publicdomain/zero/1.0/") else Nil)
  }

  /** Companion records exercising the Set-curation and event
    * used_specific_object paths (mapper.py:485-505, :722-730): a Set for
    * every ck % 4 == 2 key and an Activity for every ck % 4 == 3 key, in
    * their own `x`/`y` id spaces. */
  private[graft] def extraFixture(ck: Long): Seq[MlRecord] = {
    val set = if (ck % 4 == 2) Seq(MlRecord(
      id = I + "x" + ck,
      rtype = "Set",
      about = if (ck % 5 == 0) Seq(Ref(I + "ab" + (ck % 33), "Person")) else Nil,
      about_influences =
        if (ck % 5 == 2) Seq(Ref(I + "inf" + (ck % 44), "Place")) else Nil,
      used_for_refs = if (ck % 3 == 1) Seq(I + "uf" + (ck % 22)) else Nil,
      events = if (ck % 3 != 1) Map("used_for" -> Event(
        classified_as = Seq(CurationMeta),
        carried_out_by = Seq(Ref(I + "cu" + (ck % 19))))) else Map.empty))
    else Nil
    val act = if (ck % 4 == 3) Seq(MlRecord(
      id = I + "y" + ck,
      rtype = "Activity",
      carried_out_by = if (ck % 3 != 0) Seq(I + "a" + (ck % 50)) else Nil,
      used_specific_object =
        if (ck % 5 <= 1) Seq(I + "uso" + (ck % 27)) else Nil))
    else Nil
    set ++ act
  }

  private def docs(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].flatMap(ck =>
        (fixture(ck) +: extraFixture(ck)).map(MlMapper.transform(_, Excludes)))
  }

  /** M14 triples: the full shortcut/classification/reference triple set. */
  def shortcutTriples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .flatMap(d => d.triples.map(t => (d.id, t.predicate, t.obj)))
      .toDF("subject", "predicate", "obj")
  }

  /** M14 facets: dataType + the four boolean facets. */
  def facets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .map(d => (d.id, d.facets.dataType, d.facets.isCollectionItem.toLong,
        d.facets.hasDigitalImage.toLong, d.facets.isOnline.toLong,
        d.facets.isPublicDomain.toLong))
      .toDF("id", "data_type", "is_collection_item", "has_digital_image",
        "is_online", "is_public_domain")
  }

  /** A LUX facet query compiled end-to-end against the M14 substrate:
    * online VisualItems depicting a Person-typed record — facet boolean
    * leaf + exact-type leaf + relationship hop over the shortcut
    * triples, all through the LuxQL parser/compiler. */
  def luxFacet(spark: SparkSession, dir: String): DataFrame = {
    val e = facets(spark, dir).withColumnRenamed("data_type", "etype")
    val t = shortcutTriples(spark, dir).withColumnRenamed("obj", "object")
    new graft.plans.LuxCompiler(e, t, graft.plans.LuxCatalog.records)
      .compile("""AND(etype="VisualItem", is_online=1, lux:about_or_depicts(etype="Person"))""")
  }

  private val luxFacetOracle: String =
    s"""SELECT '$I' || 'r' || c_custkey AS id
       |FROM customer c
       |WHERE c_custkey % 8 = 7
       |  AND (c_custkey % 3 = 1 OR (c_custkey % 5 = 0 AND c_custkey % 10 <> 0))
       |  AND EXISTS (SELECT 1 FROM customer c2
       |    WHERE c2.c_custkey = 8 * (c.c_custkey % 150) + 1)""".stripMargin

  // ---------------------------------------------------------- oracles

  /** One SELECT per triple rule; `cond` in terms of ck/t. */
  private def row(cond: String, pred: String, obj: String): String =
    s"SELECT s AS subject, '$pred' AS predicate, $obj AS obj FROM b WHERE $cond"

  private val shortcutsOracle: String = {
    val internal = s"'$I'"
    // shared expressions
    val a = s"$internal || 'a' || (ck % 50)"
    val a1 = s"$internal || 'a' || ((ck + 1) % 50)"
    val a3 = s"$internal || 'a' || ((ck + 3) % 50)"
    val p = s"$internal || 'p' || (ck % 30)"
    val p1 = s"$internal || 'p' || ((ck + 1) % 30)"
    val p2 = s"$internal || 'p' || ((ck + 2) % 30)"
    val p5 = s"$internal || 'p' || ((ck + 5) % 30)"
    val i40 = s"$internal || 'i' || (ck % 40)"
    val ab = s"$internal || 'r' || (8 * (ck % 150) + 1)"
    val rp = s"$internal || 'rp' || (ck % 21)"
    val lo = s"$internal || 'lo' || (ck % 12)"
    val tt = s"$internal || 't' || (ck % 9)"
    val s15 = s"$internal || 's' || (ck % 15)"
    val w = s"$internal || 'w' || (ck % 25)"
    val cls = "'aat:cls' || (ck % 20)"
    val nat = "'aat:nat' || (ck % 5)"
    val gen = "'aat:gen' || (ck % 3)"
    val occ = "'aat:occ' || (ck % 4)"

    // rdf:type rows
    val typeRows = Seq(
      ("t=0", Seq("crm:E22_Human-Made_Object", "lux:Item")),
      ("t=1", Seq("crm:E21_Person", "lux:Agent")),
      ("t=2", Seq("crm:E74_Group", "lux:Agent")),
      ("t=3", Seq("crm:E53_Place")),
      ("t=4", Seq("crm:E55_Type", "lux:Concept")),
      ("t=5", Seq("crm:E33_Linguistic_Object", "lux:Work")),
      ("t=6", Seq("crm:D1_Digital_Object", "lux:Item")),
      ("t=7", Seq("crm:E36_Visual_Item", "lux:Work"))
    ).flatMap { case (c, objs) => objs.map(o => row(c, "rdf:type", s"'$o'")) }

    // per-type classification pfx
    val pfxCase =
      "CASE t WHEN 0 THEN 'item' WHEN 1 THEN 'agent' WHEN 2 THEN 'agent' " +
      "WHEN 3 THEN 'place' WHEN 4 THEN 'concept' WHEN 5 THEN 'work' " +
      "WHEN 6 THEN 'item' ELSE 'work' END"
    val refPfx = "t IN (1,2,3,4)" // agent/place/concept pfx types
    def clsRows(cond: String, obj: String, extra: Seq[(String, String)]): Seq[String] =
      Seq(
        row(cond, "crm:P2_has_type", obj),
        s"SELECT s AS subject, 'lux:' || $pfxCase || 'ClassifiedAs' AS predicate, $obj AS obj FROM b WHERE $cond",
        s"SELECT s AS subject, 'lux:referenceClassifiedAs' AS predicate, $obj AS obj FROM b WHERE ($cond) AND $refPfx"
      ) ++ extra.map { case (p2c, c2) => row(s"($cond) AND ($c2)", p2c, obj) }
    val classificationRows =
      clsRows("ck % 3 = 0", cls, Nil) ++
      clsRows("t = 1 AND ck % 5 <> 0", nat, Seq(("lux:agentNationality", "TRUE"))) ++
      clsRows("t = 1 AND ck % 7 = 0", gen, Seq(("lux:agentGender", "TRUE"))) ++
      clsRows("t = 2 AND ck % 5 = 0", occ, Seq(("lux:agentOccupation", "TRUE")))

    // member_of / equivalent
    val memberRows = Seq(
      s"SELECT s AS subject, CASE WHEN t IN (1,2) THEN 'crm:P107i_is_current_or_former_member_of' ELSE 'la:member_of' END AS predicate, $s15 AS obj FROM b WHERE ck % 9 = 0",
      row("ck % 7 = 0", "la:equivalent", "'http://vocab.getty.edu/x' || ck"))

    // shortcut triples per type
    val shortcutRows = Seq(
      // t0 HumanMadeObject: produced_by
      row("t=0", "lux:agentOfProduction", a),
      row("t=0 AND ck % 7 = 0", "lux:agentOfProduction", a1),
      row("t=0 AND ck % 5 = 0", "lux:agentOfProduction", a3),
      row("t=0 AND ck % 3 = 0", "lux:placeOfProduction", p),
      row("t=0 AND ck % 7 = 0 AND ck % 3 = 0", "lux:placeOfProduction", p2),
      row("t=0 AND ck % 5 = 0", "lux:techniqueOfProduction", "'aat:tech' || (ck % 10)"),
      row("t=0 AND ck % 9 = 0 AND ck % 5 <> 0", "lux:agentInfluencedProduction", i40),
      row("t=0 AND ck % 9 = 0 AND ck % 5 = 0", "lux:otherInfluencedProduction", i40),
      // t1 Person: born / died / carried_out
      row("t=1 AND ck % 3 <> 0", "lux:placeOfBeginning", p),
      row("t=1 AND ck % 5 = 0", "lux:placeOfEnding", p1),
      row("t=1 AND ck % 7 = 0", "lux:placeOfActivity", p2),
      row("t=1 AND ck % 7 = 0", "lux:typeOfProfessionalActivity", "'aat:job' || (ck % 6)"),
      // t2 Group: formed_by
      row("t=2 AND ck % 3 = 0", "lux:agentOfBeginning", a),
      // t5 LinguisticObject: created_by
      row("t=5", "lux:agentOfCreation", a),
      row("t=5 AND ck % 9 = 0", "lux:placeInfluencedCreation", i40))

    // class-specific rows
    val classRows = Seq(
      row("t=0 AND ck % 3 = 1", "lux:carries_or_shows", w),
      row("t=0 AND ck % 3 = 1", "crm:P128_carries", w),
      row("t=0 AND ck % 5 = 0", "crm:P45_consists_of", "'aat:mat' || (ck % 6)"),
      row("t=6 AND ck % 3 = 0", "lux:carries_or_shows", lo),
      row("t=6 AND ck % 3 = 0", "la:digitally_carries", lo),
      // about family (t5 + t7)
      row("t IN (5,7)", "lux:about_or_depicts", ab),
      row("t IN (5,7)", "crm:P129_is_about", ab),
      row("t IN (5,7) AND ck % 3 = 0", "lux:about_or_depicts_agent", ab),
      row("t IN (5,7) AND ck % 3 = 0", "lux:about_agent", ab),
      row("t IN (5,7) AND ck % 3 = 2", "lux:about_or_depicts_place", ab),
      row("t IN (5,7) AND ck % 3 = 2", "lux:about_place", ab),
      // t7 represents
      row("t=7 AND ck % 5 = 0", "lux:about_or_depicts", rp),
      row("t=7 AND ck % 5 = 0", "crm:P138_represents", rp),
      row("t=7 AND ck % 5 = 0", "lux:about_or_depicts_place", rp),
      row("t=7 AND ck % 5 = 0", "lux:depicts_place", rp),
      // t5 language + part_of
      row("t=5 AND ck % 3 = 0", "crm:P72_has_language", "'lang:en'"),
      row("t=5 AND ck % 3 = 0", "lux:workLanguage", "'lang:en'"),
      row("t=5 AND ck % 5 = 0", "crm:P106i_forms_part_of", lo),
      // t3 Place part_of; t4 Type broader
      row("t=3", "crm:P89_falls_within", p5),
      row("t=4 AND ck % 3 <> 1", "skos:broader", tt))

    // lux:any / {pfx}Any / referenceAny per ref; refAnyTypes = t 1,2,3,4
    val anyPfx = pfxCase
    def anyRows(cond: String, obj: String): Seq[String] = Seq(
      s"SELECT s AS subject, 'lux:' || $anyPfx || 'Any' AS predicate, $obj AS obj FROM b WHERE $cond",
      row(cond, "lux:any", obj),
      row(s"($cond) AND t IN (1,2,3,4)", "lux:referenceAny", obj))
    val refRows =
      // t0: a, p?, i?, a1?, w?, s?
      anyRows("t=0", a) ++
      anyRows("t=0 AND ck % 3 = 0", p) ++
      anyRows("t=0 AND ck % 9 = 0", i40) ++
      anyRows("t=0 AND ck % 7 = 0", a1) ++
      anyRows("t=0 AND ck % 3 = 1", w) ++
      // t1: born p, died p1, activity p2
      anyRows("t=1 AND ck % 3 <> 0", p) ++
      anyRows("t=1 AND ck % 5 = 0", p1) ++
      anyRows("t=1 AND ck % 7 = 0", p2) ++
      // t2: formed_by a
      anyRows("t=2 AND ck % 3 = 0", a) ++
      // t3: part_of p5; t4: broader tt
      anyRows("t=3", p5) ++
      anyRows("t=4 AND ck % 3 <> 1", tt) ++
      // t5: a, i?, ab, lo (part_of)?
      anyRows("t=5", a) ++
      anyRows("t=5 AND ck % 9 = 0", i40) ++
      anyRows("t IN (5,7)", ab) ++
      anyRows("t=5 AND ck % 5 = 0", lo) ++
      // t7: rp?
      anyRows("t=7 AND ck % 5 = 0", rp) ++
      // member_of s ref, all types
      anyRows("ck % 9 = 0", s15)

    // refCtr: internal ids reachable ONLY under ignored props, minus the
    // exclusion list (a0/p0): t0 attributed a3 + part-attributed p2
    val refCtrRows = Seq(
      row(s"t=0 AND ck % 5 = 0 AND (ck + 3) % 50 <> 0", "lux:refCtr", a3),
      row(s"t=0 AND ck % 7 = 0 AND ck % 3 = 0 AND (ck + 2) % 30 <> 0", "lux:refCtr", p2),
      // t6 digitally_carries is internal but under an ignored prop
      row(s"t=6 AND ck % 3 = 0", "lux:refCtr", lo))

    // companion Set (x ids) / Activity (y ids) records
    def srow(subj: String, cond: String, pred: String, obj: String): String =
      s"SELECT $subj AS subject, '$pred' AS predicate, $obj AS obj FROM b WHERE $cond"
    val xs = s"$internal || 'x' || ck"
    val ys = s"$internal || 'y' || ck"
    val uf = s"$internal || 'uf' || (ck % 22)"
    val cu = s"$internal || 'cu' || (ck % 19)"
    val ab2 = s"$internal || 'ab' || (ck % 33)"
    val inf = s"$internal || 'inf' || (ck % 44)"
    val uso = s"$internal || 'uso' || (ck % 27)"
    val setRows = Seq(
      srow(xs, "ck % 4 = 2", "rdf:type", "'la:Set'"),
      srow(xs, "ck % 4 = 2 AND ck % 3 = 1", "crm:P16i_was_used_for", uf),
      srow(xs, "ck % 4 = 2 AND ck % 3 <> 1", "lux:agentOfCuration", cu),
      // the curation event also walks as the used_for -> Publication shortcut
      srow(xs, "ck % 4 = 2 AND ck % 3 <> 1", "lux:agentOfPublication", cu),
      srow(xs, "ck % 4 = 2 AND ck % 5 = 0", "lux:about_or_depicts", ab2),
      srow(xs, "ck % 4 = 2 AND ck % 5 = 0", "crm:P129_is_about", ab2),
      srow(xs, "ck % 4 = 2 AND ck % 5 = 0", "lux:about_or_depicts_agent", ab2),
      srow(xs, "ck % 4 = 2 AND ck % 5 = 0", "lux:about_agent", ab2),
      srow(xs, "ck % 4 = 2 AND ck % 5 = 2", "lux:about_or_depicts", inf),
      srow(xs, "ck % 4 = 2 AND ck % 5 = 2", "crm:P129_is_about", inf),
      srow(xs, "ck % 4 = 2 AND ck % 5 = 2", "lux:about_or_depicts_place", inf),
      srow(xs, "ck % 4 = 2 AND ck % 5 = 2", "lux:about_place", inf)) ++
      Seq(cu -> "ck % 3 <> 1", ab2 -> "ck % 5 = 0", inf -> "ck % 5 = 2",
        uf -> "ck % 3 = 1").flatMap { case (o, c) => Seq(
          srow(xs, s"ck % 4 = 2 AND $c", "lux:setAny", o),
          srow(xs, s"ck % 4 = 2 AND $c", "lux:any", o)) }
    val actRows = Seq(
      srow(ys, "ck % 4 = 3", "rdf:type", "'crm:E7_Activity'"),
      srow(ys, "ck % 4 = 3", "rdf:type", "'lux:Event'"),
      srow(ys, "ck % 4 = 3 AND ck % 3 <> 0", "lux:eventCarriedOutBy", a),
      srow(ys, "ck % 4 = 3 AND ck % 5 <= 1", "crm:P16_used_specific_object", uso)) ++
      Seq(a -> "ck % 3 <> 0", uso -> "ck % 5 <= 1").flatMap { case (o, c) => Seq(
        srow(ys, s"ck % 4 = 3 AND $c", "lux:eventAny", o),
        srow(ys, s"ck % 4 = 3 AND $c", "lux:any", o),
        srow(ys, s"ck % 4 = 3 AND $c", "lux:referenceAny", o)) }

    val all = (typeRows ++ classificationRows ++ memberRows ++ shortcutRows ++
      classRows ++ refRows ++ refCtrRows ++ setRows ++ actRows).mkString("\nUNION ALL\n")
    s"""WITH b AS (
       |  SELECT c_custkey AS ck, c_custkey % 8 AS t,
       |    '$I' || 'r' || c_custkey AS s
       |  FROM customer)
       |$all""".stripMargin
  }

  private val facetsOracle: String =
    s"""SELECT '$I' || 'r' || ck AS id,
       |  CASE t WHEN 0 THEN 'HumanMadeObject' WHEN 1 THEN 'Person'
       |    WHEN 2 THEN 'Group' WHEN 3 THEN 'Place' WHEN 4 THEN 'Type'
       |    WHEN 5 THEN 'LinguisticObject' WHEN 6 THEN 'DigitalObject'
       |    ELSE 'VisualItem' END AS data_type,
       |  CASE WHEN ck % 10 = 0 AND ck % 11 <> 0 THEN 1 ELSE 0 END AS is_collection_item,
       |  CASE WHEN ck % 3 = 1 THEN 1 ELSE 0 END AS has_digital_image,
       |  CASE WHEN t IN (0,5,6,7) AND (
       |      ck % 3 = 1
       |      OR (t = 6 AND ck % 5 = 0)
       |      OR (ck % 5 = 0 AND ck % 10 <> 0))
       |    THEN 1 ELSE 0 END AS is_online,
       |  CASE WHEN t IN (5,7) AND ck % 7 = 0 THEN 1 ELSE 0 END AS is_public_domain
       |FROM (SELECT c_custkey AS ck, c_custkey % 8 AS t FROM customer)
       |UNION ALL
       |SELECT '$I' || 'x' || c_custkey AS id, 'Set' AS data_type,
       |  0 AS is_collection_item, 0 AS has_digital_image, 0 AS is_online,
       |  0 AS is_public_domain
       |FROM customer WHERE c_custkey % 4 = 2
       |UNION ALL
       |SELECT '$I' || 'y' || c_custkey AS id, 'Activity' AS data_type,
       |  0 AS is_collection_item, 0 AS has_digital_image, 0 AS is_online,
       |  0 AS is_public_domain
       |FROM customer WHERE c_custkey % 4 = 3""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("m14_shortcuts", shortcutTriples, Some(shortcutsOracle)))
    Queries.register(QueryDef("m14_facets", facets, Some(facetsOracle)))
    Queries.register(QueryDef("lux_q5_facet", luxFacet, Some(luxFacetOracle)))
  }
}
