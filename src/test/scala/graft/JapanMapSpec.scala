package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.JapanMap
import graft.pipeline.JapanMap.JName

/** NDL (japan) mapper kernels (libraries/japan/mapper.py). */
class JapanMapSpec extends AnyFunSuite {

  test("langOf: primary subtag through the process_langs gate") {
    assert(JapanMap.langOf("ja-Latn") === Some("ja"))
    assert(JapanMap.langOf("en-GB") === Some("en"))
    assert(JapanMap.langOf("zz-x") === None)
    assert(JapanMap.langOf("ja") === Some("ja"))
  }

  test("names: transcriptions first, guarded but never added; alt " +
      "literals guard AND add; fallback label when no literalForm") {
    val out = JapanMap.names(
      prefLiteral = "P", labelFallback = "FB",
      prefTxns = Seq(("P", "ja"), ("T", "ja-Latn"), ("T", "en-GB")),
      alts = Seq(("A", Seq(("V", "zz"))), ("A", Nil), ("", Seq(("P", "de")))),
      topicName = "TN")
    assert(out === Seq(
      JName("T", Some("ja"), true), // txn == pref skipped; T emits
      JName("T", Some("en"), true), // and AGAIN: never added to dupes
      JName("P", None, true),       // the preferred literal, AFTER txns
      JName("A", None, false),      // first alt literal
      JName("V", None, false),      // zz unmapped: lang dropped
      JName("TN", None, false)))    // topic name alternate
  }

  test("names: fallback label seeds the guard; empty alt adds to guard") {
    val out = JapanMap.names("", "FB", Seq(("FB", "ja")),
      Seq(("", Seq(("FB", "de")))), "")
    // FB transcription and FB alt-txn both guarded by the fallback
    assert(out === Seq(JName("FB", None, true)))
  }

  test("rename classifications: previous vs later wikidata entities") {
    assert(JapanMap.renameClass(later = false) ===
      "http://www.wikidata.org/entity/Q79030196")
    assert(JapanMap.renameClass(later = true) ===
      "http://www.wikidata.org/entity/Q79030284")
  }

  test("person bio: fields carry ja, biographical info carries none") {
    assert(JapanMap.personBio(Seq("f1"), Seq("b1", "b2")) ===
      Seq(("f1", "ja"), ("b1", ""), ("b2", "")))
  }
}
