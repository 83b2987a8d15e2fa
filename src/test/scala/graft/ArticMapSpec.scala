package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ArticMap
import graft.pipeline.ArticMap.Timespan

/** M1j: the Art Institute of Chicago museum mapper exemplar
  * (`museums/artic/mapper.py`). */
class ArticMapSpec extends AnyFunSuite {

  test("guess_type routes api_model; agents split on is_artist") {
    assert(ArticMap.guessType("artworks", isArtist = false) === "HumanMadeObject")
    assert(ArticMap.guessType("exhibitions", isArtist = true) === "Activity")
    assert(ArticMap.guessType("agents", isArtist = true) === "Person")
    assert(ArticMap.guessType("agents", isArtist = false) === "Group")
    assert(ArticMap.guessType("whatever", isArtist = true) === "Group")
  }

  test("uri minting picks the per-class endpoint") {
    assert(ArticMap.mintUri("Person", 7L).endsWith("/agents/7"))
    assert(ArticMap.mintUri("HumanMadeObject", 7L).endsWith("/artworks/7"))
    assert(ArticMap.mintUri("Activity", 7L).endsWith("/exhibitions/7"))
  }

  test("life events collapse the parsed range to (bb, ee)") {
    assert(ArticMap.timespan("1880", None, None, life = true) ===
      Timespan("1880-01-01T00:00:00", "", "", "1880-12-31T23:59:59", "1880"))
    // >10 chars truncates at the T before parsing and display
    assert(ArticMap.timespan("1880-05-02T00:00:00", None, None, life = true) ===
      Timespan("1880-05-02T00:00:00", "", "", "1880-05-02T23:59:59", "1880-05-02"))
    assert(ArticMap.timespan("1880", None, Some("c. 1880"), life = true).display
      === "c. 1880")
  }

  test("production timespans: the four-point fallback matrix") {
    // both parse: begin pair from d1, end pair from d2, 'd1 - d2' display
    assert(ArticMap.timespan("1880", Some("1890"), None, life = false) ===
      Timespan("1880-01-01T00:00:00", "1880-12-31T23:59:59",
        "1890-01-01T00:00:00", "1890-12-31T23:59:59", "1880 - 1890"))
    // only begins: collapses like a life event
    assert(ArticMap.timespan("1880", Some("9999"), None, life = false) ===
      Timespan("1880-01-01T00:00:00", "", "", "1880-12-31T23:59:59", "1880"))
    assert(ArticMap.timespan("1880", None, None, life = false).bb
      === "1880-01-01T00:00:00")
    // only ends: that side collapses, display names the END date
    assert(ArticMap.timespan("9999", Some("1890"), None, life = false) ===
      Timespan("1890-01-01T00:00:00", "", "", "1890-12-31T23:59:59", "1890"))
    // neither: empty timespan, empty display
    assert(ArticMap.timespan("9999", Some("9999"), None, life = false) ===
      Timespan("", "", "", "", ""))
  }

  test("category routing: a concordance miss demotes the property") {
    assert(ArticMap.categoryRoute("material", Some("300015050"), "oil paint")._1
      === "made_of")
    assert(ArticMap.categoryRoute("material", None, "oil paint") ===
      (("referred_to_by.MaterialStatement", "", "oil paint")))
    assert(ArticMap.categoryRoute("style", Some("300021147"), "impressionism")._1
      === "shows.classified_as.Style")
    assert(ArticMap.categoryRoute("style", None, "impressionism")._1
      === "shows.classified_as.Type")
    assert(ArticMap.categoryRoute("technique", None, "etching") ===
      (("production.technique", "", "etching")))
    assert(ArticMap.categoryRoute("subject", Some("300055866"), "war")._2
      === "https://vocab.getty.edu/aat/300055866")
  }

  test("artists dict-zip: first position, last title per duplicate id") {
    assert(ArticMap.artists(Seq(1L, 2L, 1L), Seq("a", "b", "c"))
      === Seq((1L, "c"), (2L, "b")))
    assert(ArticMap.artists(Nil, Nil) === Nil)
  }
}
