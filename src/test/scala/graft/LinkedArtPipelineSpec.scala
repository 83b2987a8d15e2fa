package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.LinkedArt

/** Hermetic golden-fixture run of the end-to-end slice (SURVEY §7.2,
  * FIXTURES.md §A): envelopes → names → reconcile (+ differentFrom
  * veto) → idmap CC + deterministic YUIDs → reidentify → merge →
  * JSONL export. */
class LinkedArtPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val wd = "http://www.wikidata.org/entity/"
  private val lc = "http://id.loc.gov/authorities/names/"

  private def rec(id: String, typ: String, label: String, names: Seq[String],
      parts: Option[(String, String)] = None, equivalents: Seq[(String, String)] = Nil,
      refersTo: Seq[(String, String)] = Nil, wkt: Option[String] = None): String = {
    def q(s: String) = "\"" + s + "\""
    val nameObjs = names.map { n =>
      val p = parts.map { case (a, b) =>
        s""","part":[{"type":"Name","content":${q(a)}},{"type":"Name","content":${q(b)}}]"""
      }.getOrElse("")
      s"""{"type":"Name","content":${q(n)}$p}"""
    }.mkString("[", ",", "]")
    val eqs = equivalents.map { case (u, t) =>
      s"""{"id":${q(u)},"type":${q(t)}}""" }.mkString("[", ",", "]")
    val refs = refersTo.map { case (u, t) =>
      s"""{"id":${q(u)},"type":${q(t)}}""" }.mkString("[", ",", "]")
    val geo = wkt.map(w => s""","defined_by":${q(w)}""").getOrElse("")
    s"""{"id":${q(id)},"type":${q(typ)},"_label":${q(label)},
       |"identified_by":$nameObjs,"equivalent":$eqs,"refers_to":$refs$geo}""".stripMargin
  }

  private lazy val fixtures = {
    import spark.implicits._
    Seq(
      ("Q937", "wikidata", rec(wd + "Q937", "Person", "Albert Einstein",
        Seq("Albert Einstein"), parts = Some(("Albert", "Einstein")),
        equivalents = Seq((lc + "n79022889", "Person")))),
      ("n79022889", "lc", rec(lc + "n79022889", "Person", "Einstein, Albert",
        Seq("Einstein, Albert"))),
      ("Q999", "wikidata", rec(wd + "Q999", "Person", "Fake Einstein",
        Seq("Albert Einstein"))),
      ("ulm1", "geonames", rec("http://sws.geonames.org/2820256/", "Place",
        "Ulm", Seq("Ulm"),
        wkt = Some("POLYGON((9.9 48.3, 10.0 48.3, 10.0 48.4, 9.9 48.3))"))),
      ("ulmWd", "wikidata", rec(wd + "Q3012", "Place", "Ulm, Germany",
        Seq("Ulm"),
        equivalents = Seq(("http://sws.geonames.org/2820256/", "Place")),
        wkt = Some("POINT(9.99 48.39)"))),
      ("doc1", "ycba", rec("https://unit.example/data/obj/1", "HumanMadeObject",
        "Portrait", Seq("Portrait of Einstein"),
        refersTo = Seq((wd + "Q937", "Person"), ("urn:unknown:x", "Type"))))
    ).toDF("identifier", "source", "data")
  }

  private lazy val parsedEnv = LinkedArt.parsed(fixtures)

  private lazy val nameIndex = {
    import spark.implicits._
    Seq(
      ("albert einstein", wd + "Q937", "Person"),
      ("einstein, albert", wd + "Q937", "Person"),
      ("ulm", "http://sws.geonames.org/2820256/", "Place"))
      .toDF("name", "idxuri", "idxtype")
  }
  private lazy val uriIndex = {
    import spark.implicits._
    Seq((lc + "n79022889", "Person"),
      ("http://sws.geonames.org/2820256/", "Place")).toDF("idxuri", "idxtype")
  }
  private lazy val differentFrom = {
    import spark.implicits._
    Seq((wd + "Q999##quaPerson", wd + "Q937##quaPerson")).toDF("a", "b")
  }

  private lazy val edges = LinkedArt
    .reconcileEdges(parsedEnv, nameIndex, uriIndex, differentFrom)
    .union(LinkedArt.selfEdges(parsedEnv))
  private lazy val idmap = LinkedArt.idmap(edges)

  test("candidate names include last-first permutation, cleaned") {
    import spark.implicits._
    val names = LinkedArt.candidateNames(parsedEnv)
      .filter($"identifier" === "Q937").select($"name").as[String].collect().toSet
    assert(names === Set("albert einstein", "einstein, albert"))
  }

  test("differentFrom vetoes the name-match edge for the imposter") {
    import spark.implicits._
    val q999Edges = LinkedArt
      .reconcileEdges(parsedEnv, nameIndex, uriIndex, differentFrom)
      .filter($"src".contains("Q999")).count()
    assert(q999Edges === 0)
  }

  test("idmap clusters einstein records together, others apart, yuids deterministic") {
    import spark.implicits._
    val m = idmap.as[(String, String)].collect().toMap
    assert(m(wd + "Q937##quaPerson") === m(lc + "n79022889##quaPerson"))
    assert(m(wd + "Q999##quaPerson") !== m(wd + "Q937##quaPerson"))
    assert(m("http://sws.geonames.org/2820256/##quaPlace") !== m(wd + "Q937##quaPerson"))
    // deterministic minting: a rebuilt idmap produces identical yuids
    val m2 = LinkedArt.idmap(edges).as[(String, String)].collect().toMap
    assert(m === m2)
  }

  test("reidentify rewrites known refs to yuids, keeps unknown") {
    import spark.implicits._
    val m = idmap.as[(String, String)].collect().toMap
    val refs = LinkedArt.reidentify(parsedEnv, idmap)
      .filter($"identifier" === "doc1")
      .select($"refs_rewritten").as[Seq[String]].head()
    assert(refs.contains(m(wd + "Q937##quaPerson")))
    assert(refs.contains("urn:unknown:x##quaType"))
  }

  test("merge elects label by merge order and unions equivalents") {
    import spark.implicits._
    val m = idmap.as[(String, String)].collect().toMap
    val merged = LinkedArt.merge(parsedEnv, idmap,
      Map("wikidata" -> 1, "lc" -> 2, "geonames" -> 3, "ycba" -> 4))
    val einstein = merged.filter($"yuid" === m(wd + "Q937##quaPerson"))
      .select($"label", $"n_merged", $"equivalents").head()
    assert(einstein.getString(0) === "Albert Einstein") // wikidata wins
    assert(einstein.getLong(1) === 2L)
    assert(einstein.getSeq[String](2) === Seq(lc + "n79022889"))
    assert(merged.count() === 4) // einstein cluster, imposter, ulm cluster, doc1
  }

  test("A2 place merge: polygon beats point regardless of merge order") {
    import spark.implicits._
    val m = idmap.as[(String, String)].collect().toMap
    // ulm cluster = geonames polygon (ord 3) + wikidata point (ord 1)
    assert(m("http://sws.geonames.org/2820256/##quaPlace") ===
      m(wd + "Q3012##quaPlace"))
    val merged = LinkedArt.merge(parsedEnv, idmap,
      Map("wikidata" -> 1, "lc" -> 2, "geonames" -> 3, "ycba" -> 4))
    val ulm = merged.filter($"yuid" === m(wd + "Q3012##quaPlace"))
      .select($"label", $"geometry", $"n_merged").head()
    assert(ulm.getString(0) === "Ulm, Germany") // label: merge order wins
    assert(ulm.getString(1).startsWith("POLYGON")) // geometry: polygon wins
    assert(ulm.getLong(2) === 2L)
  }

  test("jsonl export emits one line per merged entity") {
    val merged = LinkedArt.merge(parsedEnv, idmap, Map("wikidata" -> 1))
    val lines = LinkedArt.exportJsonl(merged).collect()
    assert(lines.length === merged.count())
    assert(lines.forall(_.getString(0).startsWith("{\"yuid\":")))
  }
}
