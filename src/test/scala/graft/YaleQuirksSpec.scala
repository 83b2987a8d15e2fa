package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.YaleQuirks
import graft.pipeline.YaleQuirks.YpmName

/** Yale unit mapper kernels (ypm/yuag/pmc). */
class YaleQuirksSpec extends AnyFunSuite {
  private val Primary = "http://vocab.getty.edu/aat/300404670"
  private val Item = "http://vocab.getty.edu/aat/300404024"

  test("ypm species fill: first empty-id Species only, Type records only") {
    assert(YaleQuirks.ypmSpeciesFill("Type",
      Seq(("", "Species"), ("", "Species"))) ===
      Seq(("https://www.wikidata.org/entity/Q7432", "Species"), ("", "Species")))
    assert(YaleQuirks.ypmSpeciesFill("Type", Seq(("x", "Species"))) ===
      Seq(("x", "Species"))) // non-empty id untouched
    assert(YaleQuirks.ypmSpeciesFill("Place", Seq(("", "Species"))) ===
      Seq(("", "Species")))
  }

  test("ypm no-locality swap: order-sensitive scan") {
    // primary before alternate: swap, alternate removed
    assert(YaleQuirks.ypmNoLocalitySwap("Place", Seq(
      YpmName("[No Locality Data]", Seq(Primary)),
      YpmName("Real", Seq("c")))) ===
      Seq(YpmName("Real", Seq(Primary))))
    // alternate FIRST stops the scan before the primary is seen
    assert(YaleQuirks.ypmNoLocalitySwap("Place", Seq(
      YpmName("Real", Seq("c")),
      YpmName("[no locality data]", Seq(Primary)))).map(_.content) ===
      Seq("Real", "[no locality data]"))
    // no-locality name without the primary class never swaps
    assert(YaleQuirks.ypmNoLocalitySwap("Place", Seq(
      YpmName("[no locality data]", Seq("other")),
      YpmName("Real", Seq("c")))).map(_.content) ===
      Seq("[no locality data]", "Real"))
    // unclassified names are skipped by the scan entirely
    assert(YaleQuirks.ypmNoLocalitySwap("Place", Seq(
      YpmName("[no locality data]", Seq(Primary)),
      YpmName("skipme", Nil),
      YpmName("Real", Seq("c")))).map(_.content) === Seq("Real", "skipme"))
    assert(YaleQuirks.ypmNoLocalitySwap("Group", Seq(
      YpmName("[no locality data]", Seq(Primary)),
      YpmName("Real", Seq("c")))).length === 2) // Place only
  }

  test("ypm defined_by gate: POLYGON/POINT only, trimmed") {
    assert(YaleQuirks.ypmDefinedBy("  POLYGON ((0 0))") === Some("POLYGON ((0 0))"))
    assert(YaleQuirks.ypmDefinedBy("POINT (1 2)") === Some("POINT (1 2)"))
    assert(YaleQuirks.ypmDefinedBy("LINESTRING (0 0)") === None)
    assert(YaleQuirks.ypmDefinedBy("") === None)
  }

  test("collection item: ypm gates on HMO + 3 classes, yuag on 1, no type") {
    val acc = "http://vocab.getty.edu/aat/300312355"
    assert(YaleQuirks.collectionItem("HumanMadeObject", Seq(acc), Seq("c"),
      yuag = false) === Seq("c", Item))
    assert(YaleQuirks.collectionItem("Type", Seq(acc), Seq("c"),
      yuag = false) === Seq("c")) // type gate
    assert(YaleQuirks.collectionItem("Type", Seq(acc), Seq("c"),
      yuag = true) === Seq("c", Item)) // yuag: no type gate
    assert(YaleQuirks.collectionItem("HumanMadeObject",
      Seq("http://vocab.getty.edu/aat/300404620"), Seq("c"),
      yuag = true) === Seq("c")) // yuag: accession id is NOT in its gate
    assert(YaleQuirks.collectionItem("HumanMadeObject",
      Seq("http://vocab.getty.edu/aat/300404620"), Seq("c"),
      yuag = false) === Seq("c", Item))
  }

  test("yuag retype: Group with born/died becomes Person") {
    assert(YaleQuirks.yuagRetype("Group", hasBornOrDied = true) === "Person")
    assert(YaleQuirks.yuagRetype("Group", hasBornOrDied = false) === "Group")
    assert(YaleQuirks.yuagRetype("Set", hasBornOrDied = true) === "Set")
  }

  test("yuag names: Primary Name reclass, numeric stringify, kill empty") {
    assert(YaleQuirks.yuagNames(Seq(
      ("Primary Name", Some(Right("N"))),
      ("Identifier", Some(Left(42L))),
      ("Name", None))) ===
      Seq(("Name", "N", true), ("Identifier", "42", false)))
  }

  test("yuag activity: timespan hoist + /agt/ split") {
    assert(YaleQuirks.yuagActivityTimespan(None, Some("T")) === (Some("T"), false))
    assert(YaleQuirks.yuagActivityTimespan(Some("S"), Some("T")) === (Some("S"), true))
    assert(YaleQuirks.yuagActivityTimespan(None, None) === (None, true))
    assert(YaleQuirks.yuagActivityPlaces(Seq("http://y/agt/1", "http://y/plc/2", "")) ===
      (Seq("http://y/agt/1"), Seq("http://y/plc/2", "")))
  }

  test("pmc: part_of rename, archive-set class drop, note purge") {
    assert(YaleQuirks.pmcGroupPartOf("Group", Seq("p")) === (Seq("p"), Nil))
    assert(YaleQuirks.pmcGroupPartOf("Set", Seq("p")) === (Nil, Seq("p")))
    val arch = "http://vocab.getty.edu/aat/300375748"
    val coll = "http://vocab.getty.edu/aat/300025976"
    assert(YaleQuirks.pmcSetClasses("Set", Seq(arch, coll, "o")) === Seq(arch, "o"))
    assert(YaleQuirks.pmcSetClasses("Set", Seq(coll, "o")) === Seq(coll, "o"))
    assert(YaleQuirks.pmcSetClasses("Group", Seq(arch, coll)) === Seq(arch, coll))
    assert(YaleQuirks.pmcNotes(Seq(
      ("keep", Seq("x")),
      ("kill", Seq("http://vocab.getty.edu/aat/300055458")),
      ("keep2", Nil))) === Seq("keep", "keep2"))
  }
}
