package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SmallSources
import graft.pipeline.SmallSources.RorName

/** Long-tail mapper kernels (ashmol/homosaurus/gbif/wikimedia/ror). */
class SmallSourcesSpec extends AnyFunSuite {

  test("ashmol: Collection Item appended for HMOs only") {
    assert(SmallSources.ashmolClasses("HumanMadeObject", Seq("a")) ===
      Seq("a", "http://vocab.getty.edu/aat/300404024"))
    assert(SmallSources.ashmolClasses("HumanMadeObject", Nil) ===
      Seq("http://vocab.getty.edu/aat/300404024"))
    assert(SmallSources.ashmolClasses("Person", Seq("a")) === Seq("a"))
  }

  test("homosaurus: exact dupes kept, close deduped against the list") {
    assert(SmallSources.homosaurusSames(Seq("a", "a"), Seq("a", "b")) ===
      Seq("a", "a", "b"))
    assert(SmallSources.homosaurusSames(Nil, Seq("b", "b")) === Seq("b"))
  }

  test("gbif names: scientific only when canonical AND vernacular absent") {
    assert(SmallSources.gbifNames("c", "v", "s", "r") === Seq("c", "v"))
    assert(SmallSources.gbifNames("c", "", "s", "r") === Seq("c"))
    assert(SmallSources.gbifNames("", "v", "s", "r") === Seq("v"))
    assert(SmallSources.gbifNames("", "", "s", "r") === Seq("s"))
    assert(SmallSources.gbifNames("", "", "", "r") === Seq("r"))
    assert(SmallSources.gbifNames("", "", "", "") === Nil)
  }

  test("gbif lang: unknown 3-letter code becomes None, not itself") {
    assert(SmallSources.gbifLang("eng") === Some("en"))
    assert(SmallSources.gbifLang("fre") === Some("fr"))
    assert(SmallSources.gbifLang("xyz") === None)
    assert(SmallSources.gbifLang("es") === Some("es"))
    assert(SmallSources.gbifLang("por") === None) // pt not in process_langs
  }

  test("gbif altid: known sources classify, others note the source") {
    assert(SmallSources.gbifAltidRoute("Catalogue of Life Checklist") ===
      ("classified_as", "http://www.wikidata.org/entity/Q38840"))
    assert(SmallSources.gbifAltidRoute("Nowhere") === ("assigned_by", "Nowhere"))
  }

  test("wikimedia gates: license allowlist, File: strip, raster exts") {
    assert(SmallSources.wmImage("cc0", "File:A b.JPG") ===
      Some(("A b.JPG", "https://commons.wikimedia.org/wiki/Special:Filepath/A b.JPG")))
    assert(SmallSources.wmImage("gfdl", "File:A.jpg") === None)
    assert(SmallSources.wmImage("", "File:A.jpg") === None)
    assert(SmallSources.wmImage("pd", "File:A.tiff") === None)
    assert(SmallSources.wmImage("pd", "NoPrefix.png").isDefined)
  }

  test("wikimedia credit line assembly") {
    assert(SmallSources.wmClean("<b>Hi</b>\nthere ") === "Hi there")
    assert(SmallSources.wmCredit("Nm", "T.jpg", "Art", "Cr",
      "http://l", "CC0", "Public Domain") ===
      """<span>Nm by Art Cr, <a href="http://l">CC0</a></span>""")
    // empty clean name falls back to the title; no url -> license name
    assert(SmallSources.wmCredit("", "T.jpg", "", "", "", "CC0",
      "Public Domain") === "<span>T.jpg, Public Domain</span>")
  }

  test("ror names: absent key promotes bare name, empty list blocks it; " +
      "aliases skipped; lang gated") {
    assert(SmallSources.rorNames(Some("N"), None, Nil) ===
      Seq(("N", "primary", None)))
    assert(SmallSources.rorNames(Some("N"), Some(Nil), Nil) === Nil)
    assert(SmallSources.rorNames(None, Some(Seq(
      RorName("D", Seq("ror_display"), Some("fr")),
      RorName("A", Seq("alias"), None),
      RorName("P", Nil, Some("xx")))), Seq(("L", Some("es")))) ===
      Seq(("D", "primary", Some("fr")), ("P", "name", None),
        ("L", "name", Some("es"))))
  }

  test("ror established/externals/parents") {
    assert(SmallSources.rorEstablished(Some(850)) ===
      Some(("850-01-01T00:00:00", "850-12-31T23:59:59", "850")))
    assert(SmallSources.rorEstablished(None) === None)
    assert(SmallSources.rorExternal(Seq(
      ("ISNI", Seq("1", "2")), ("GRID", Seq("g")), ("Wikidata", Seq("Q5")))) ===
      Seq("isni1", "isni2", "wdQ5"))
    assert(SmallSources.rorParents(Seq(
      ("Parent", "a"), ("child", "b"), ("PARENT", "c"))) === Seq("a", "c"))
  }
}
