package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{LuxQL, LuxSimilar}
import graft.plans.LuxSimilar.Seed

/** Q9 full SimilarQuery synthesis (ml_lexer.py:43-135): era-window
  * tiers, the keyword-emit quirk, born/died stopword removal, and the
  * synthesized string's shape through the real parser. */
class LuxSimilarSpec extends AnyFunSuite {

  test("era diff tiers: >1900 → 10, >1700 → 20, else 35 (strict >)") {
    assert(LuxSimilar.eraDiff(1901) === 10)
    assert(LuxSimilar.eraDiff(1900) === 20) // 1900 itself is NOT >1900
    assert(LuxSimilar.eraDiff(1701) === 20)
    assert(LuxSimilar.eraDiff(1700) === 35)
    assert(LuxSimilar.eraDiff(150) === 35)
  }

  test("keyword election: flatten, len>3 alpha, born/died dropped") {
    // 6 distinct survivors → top-5 emitted; 'born'/'died' and short /
    // non-alpha tokens never count
    val txt = "alpha-alpha.beta,beta gamma delta epsilon zeta born died ab x9y"
    val kws = LuxSimilar.topKeywords(Seq(txt))
    assert(kws === Seq("alpha", "beta", "delta", "epsilon", "gamma"))
    assert(!kws.contains("born") && !kws.contains("died"))
  }

  test("reference quirk: <=5 distinct keywords emit NOTHING (the emit " +
      "loop sits inside the truncation branch, ml_lexer.py:84-88)") {
    assert(LuxSimilar.topKeywords(
      Seq("alpha beta gamma delta epsilon")) === Seq.empty)
    assert(LuxSimilar.topKeywords(
      Seq("alpha beta gamma delta epsilon zeta")).length === 5)
  }

  test("synthesized string parses and has the reference's shape") {
    val s = Seed(
      classifications = Seq("c1"),
      texts = Seq("alpha beta gamma delta epsilon zeta alpha"),
      born = Some(1920), died = Some(1960), memberOf = Seq("g1"))
    val q = LuxSimilar.agentQueryString(s).get
    assert(q === """AND(OR(classification(id="c1"),text="alpha",""" +
      """text="beta",text="delta",text="epsilon",text="gamma",""" +
      """memberOf(id="g1")),AND(bornTime>1910,bornTime<1930),""" +
      """AND(diedTime>1950,diedTime<1970))""")
    val ast = LuxQL.parse(q) // must round-trip the real grammar
    ast match {
      case LuxQL.Bool("AND", Seq(LuxQL.Bool("OR", ors),
          LuxQL.Bool("AND", born), LuxQL.Bool("AND", died))) =>
        assert(ors.length === 7)
        assert(born === Seq(
          LuxQL.Leaf("bornTime", ">", null, 1910L, isNum = true),
          LuxQL.Leaf("bornTime", "<", null, 1930L, isNum = true)))
        assert(died.length === 2)
      case other => fail(s"unexpected shape: $other")
    }
  }

  test("older era widens the window (1500 → ±35)") {
    val s = Seed(classifications = Seq("c1"), born = Some(1500))
    val q = LuxSimilar.agentQueryString(s).get
    assert(q === """AND(classification(id="c1"),""" +
      """AND(bornTime>1465,bornTime<1535))""")
  }

  test("singleton / empty collapse (our grammar needs >=2-ary bools)") {
    assert(LuxSimilar.agentQueryString(Seed()) === None)
    assert(LuxSimilar.agentQueryString(Seed(memberOf = Seq("g1")))
      === Some("""memberOf(id="g1")"""))
    assert(LuxSimilar.agentQueryString(
      Seed(classifications = Seq("a", "b")))
      === Some("""OR(classification(id="a"),classification(id="b"))"""))
  }
}
