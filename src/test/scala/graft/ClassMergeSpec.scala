package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ClassMerge
import graft.pipeline.ClassMerge.Concept

/** A10: the per-class merge handlers (`merger.py:107-330`). */
class ClassMergeSpec extends AnyFunSuite {

  private def c(id: String, l: String, t: String = "Type") =
    Concept(Option(id).filter(_.nonEmpty), l, t)

  test("influenced_by: equal passes, count mismatch keeps base wholesale") {
    val base = Seq(c("a", "x"), c("b", "y"))
    assert(ClassMerge.influencedBy(base, base) === base)
    assert(ClassMerge.influencedBy(base, Seq(c("a", "x"))) === base)
  }

  test("influenced_by: same id elects the uppercased label, trimmed") {
    assert(ClassMerge.influencedBy(
      Seq(c("a", "  base ")), Seq(c("a", "Upper "))) === Seq(c("a", "Upper")))
    assert(ClassMerge.influencedBy(
      Seq(c("a", " Base ")), Seq(c("a", "upper"))) === Seq(c("a", "Base")))
  }

  test("influenced_by: same label elects specific over Type; ties keep base") {
    assert(ClassMerge.influencedBy(
      Seq(c("r", "l", "Language")), Seq(c("m", "l", "Type")))
      === Seq(c("r", "l", "Language")))
    assert(ClassMerge.influencedBy(
      Seq(c("r", "l", "Type")), Seq(c("m", "l", "Language")))
      === Seq(c("m", "l", "Language")))
    assert(ClassMerge.influencedBy(
      Seq(c("r", "l", "Language")), Seq(c("m", "l", "Material")))
      === Seq(c("r", "l", "Language")))
  }

  test("influenced_by: missing ids and irreconcilable pairs are dropped") {
    assert(ClassMerge.influencedBy(Seq(c("r", "l")), Seq(c("", "l"))) === Nil)
    // different id, different label: the reference's silent pass
    assert(ClassMerge.influencedBy(Seq(c("r", "x")), Seq(c("m", "y"))) === Nil)
  }

  test("union-by-id never introduces a self-reference") {
    assert(ClassMerge.unionById(Seq("a"), Seq("a", "self", "b"), "self")
      === Seq("a", "b"))
    assert(ClassMerge.unionById(Nil, Seq("self"), "self") === Nil)
  }

  test("contact union dedupes on trimmed content") {
    assert(ClassMerge.unionByContent(Seq(" a@x "), Seq("a@x", "b@x"))
      === Seq("a@x", "b@x"))
  }

  test("activity timespan: year-span end fixup fires only on [Y,Y+1) Jan-1s") {
    assert(ClassMerge.fixEndOfEnd("1990-01-01T00:00:00Z",
      "1991-01-01T00:00:00Z") === "1990-12-31T23:59:59Z")
    assert(ClassMerge.fixEndOfEnd("1990-01-01T00:00:00Z",
      "1992-01-01T00:00:00Z") === "1992-01-01T00:00:00Z")
    assert(ClassMerge.fixEndOfEnd("1990-03-01T00:00:00Z",
      "1991-01-01T00:00:00Z") === "1991-01-01T00:00:00Z")
    assert(ClassMerge.fixEndOfEnd("xxxx-01-01T00:00:00Z",
      "1991-01-01T00:00:00Z") === "1991-01-01T00:00:00Z")
  }

  test("activity timespan election: most specific wins; BCE sign stripped") {
    val (yb, ye) = ("1990-01-01T00:00:00", "1990-12-31T23:59:59")
    val (db, de) = ("1990-06-01T00:00:00Z", "1990-06-01T23:59:59Z")
    assert(ClassMerge.takeMergeTimespan(recEstimated = true, db, de, yb, ye))
    assert(ClassMerge.takeMergeTimespan(recEstimated = false, yb, ye, db, de))
    assert(!ClassMerge.takeMergeTimespan(recEstimated = false, db, de, yb, ye))
    assert(!ClassMerge.takeMergeTimespan(recEstimated = false, yb, ye, "junk", de))
    assert(ClassMerge.takeMergeTimespan(recEstimated = false, yb, "", db, de))
    // the reference strips the BCE '-' and compares ABSOLUTE-year spans
    assert(ClassMerge.spanSeconds("-1990-06-01T00:00:00",
      "-1990-06-01T23:59:59") === Some(86399L))
    // Python `if mdelta and mdelta < rdelta`: timedelta(0) is falsy, so
    // a zero-length merge span keeps the base
    assert(!ClassMerge.takeMergeTimespan(recEstimated = false,
      yb, ye, db, db))
    // merger.py BCE-strips the record side only; a BCE merge date fails
    // strptime → mdelta None → keep base
    assert(!ClassMerge.takeMergeTimespan(recEstimated = false, yb, ye,
      "-1990-06-01T00:00:00", "-1990-06-01T23:59:59"))
    assert(ClassMerge.spanSeconds("-1990-06-01T00:00:00",
      "-1990-06-01T23:59:59", stripBce = false) === None)
  }

  test("place election: parseability, polygon>point, coords, precision") {
    assert(ClassMerge.placeDefinedBy("junk", "POINT (1 2)")
      === Some("POINT (1 2)"))
    assert(ClassMerge.placeDefinedBy("junk", "alsojunk") === None)
    assert(ClassMerge.placeDefinedBy("POINT (1 2)",
      "POLYGON ((0 0, 1 0, 1 1, 0 0))")
      === Some("POLYGON ((0 0, 1 0, 1 1, 0 0))"))
    // polygon never yields to a point
    assert(ClassMerge.placeDefinedBy("POLYGON ((0 0, 1 0, 1 1, 0 0))",
      "POINT (1 2)") === Some("POLYGON ((0 0, 1 0, 1 1, 0 0))"))
    // more exterior coords wins; equal coords fall to textual precision
    assert(ClassMerge.placeDefinedBy(
      "POLYGON ((0 0, 1 0, 1 1, 0 0))",
      "POLYGON ((0 0, 1 0, 1 1, 0.5 0.5, 0 0))").get.contains("0.5"))
    assert(ClassMerge.placeDefinedBy("POINT (1.5 2.5)", "POINT (1.25 2.5)")
      === Some("POINT (1.25 2.5)"))
    assert(ClassMerge.placeDefinedBy("POINT (1.25 2.5)", "POINT (1.5 2.5)")
      === Some("POINT (1.25 2.5)"))
  }
}
