package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.WdTypes

class WdTypesSpec extends AnyFunSuite {
  test("instance-of lookup wins over property votes") {
    assert(WdTypes.guessType(Seq("Q5"), Seq("P625", "P1566")) === Some("Person"))
    assert(WdTypes.guessType(Seq("Qxxx", "Q515"), Nil) === Some("Place"))
  }

  test("weighted property vote decides without instance-of") {
    assert(WdTypes.guessType(Nil, Seq("P569", "P570")) === Some("Person"))
    assert(WdTypes.guessType(Nil, Seq("P625", "P106")) === Some("Place"))
    assert(WdTypes.guessType(Nil, Seq("P170", "P186")) === Some("HumanMadeObject"))
  }

  test("ties break deterministically by class name") {
    // P571 votes Group 1 + HumanMadeObject 1 -> Group (alphabetical)
    assert(WdTypes.guessType(Nil, Seq("P571")) === Some("Group"))
  }

  test("no signal -> None") {
    assert(WdTypes.guessType(Nil, Nil) === None)
    assert(WdTypes.guessType(Seq("Qxxx"), Seq("Pxxx")) === None)
  }

  test("usable as a distributed typed map stage") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      ("e1", Seq("Q5"), Seq.empty[String]),
      ("e2", Seq.empty[String], Seq("P625")),
      ("e3", Seq.empty[String], Seq.empty[String])).toDS()
    val typed = rows.map { case (id, p31, props) =>
      (id, WdTypes.guessType(p31, props).getOrElse("Unknown"))
    }.collect().toMap
    assert(typed === Map("e1" -> "Person", "e2" -> "Place", "e3" -> "Unknown"))
  }
}
