package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.BnfMap
import graft.pipeline.BnfMap.{BnfNode, Ref, Scalar}

/** M1l: the BnF mapper exemplar (`libraries/bnf/mapper.py`). */
class BnfMapSpec extends AnyFunSuite {

  test("reconstitute inlines each node once; second reference stays bare") {
    val nodes = Seq(
      BnfNode("r", Seq("a" -> Ref("c"), "b" -> Ref("c"))),
      BnfNode("c", Seq("x" -> Scalar("1"))))
    assert(BnfMap.reconstitute("r", nodes) === Some("r{a=c{x=1},b=@c}"))
  }

  test("reconstitute terminates on cycles (consumed node renders bare)") {
    val nodes = Seq(
      BnfNode("r", Seq("a" -> Ref("c"))),
      BnfNode("c", Seq("back" -> Ref("r"), "x" -> Scalar("1"))))
    // r is consumed before recursing, so c's back-ref cannot re-enter
    assert(BnfMap.reconstitute("r", nodes) === Some("r{a=c{back=@r,x=1}}"))
  }

  test("reconstitute: chains inline transitively, dangling refs stay bare") {
    val nodes = Seq(
      BnfNode("r", Seq("a" -> Ref("c"))),
      BnfNode("c", Seq("x" -> Ref("d"))),
      BnfNode("d", Seq("y" -> Scalar("7"))))
    assert(BnfMap.reconstitute("r", nodes) === Some("r{a=c{x=d{y=7}}}"))
    assert(BnfMap.reconstitute("r",
      Seq(BnfNode("r", Seq("a" -> Ref("gone"))))) === Some("r{a=@gone}"))
    assert(BnfMap.reconstitute("missing", Nil) === None)
  }

  test("labels keep content always; language only when process_langs maps it") {
    assert(BnfMap.label("Paris", Some("fr")).lang === Some("fr"))
    assert(BnfMap.label("Paris", Some("xx")) ===
      BnfMap.BnfLabel("Paris", None))
    assert(BnfMap.label("Paris", None).lang === None)
  }

  test("domaine is a fallback, not a union") {
    assert(BnfMap.broaderOrDomaine(Seq("b"), Seq("d")) === Seq("b"))
    assert(BnfMap.broaderOrDomaine(Nil, Seq("d")) === Seq("d"))
  }

  test("equivalents dedupe first-seen across exact and close") {
    assert(BnfMap.equivalents(Seq("a", "a", "b"), Seq("b", "c"))
      === Seq("a", "b", "c"))
    assert(BnfMap.equivalents(Nil, Nil) === Nil)
  }
}
