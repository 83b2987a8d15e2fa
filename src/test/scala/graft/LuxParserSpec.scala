package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.LuxQL
import graft.plans.LuxQL._

class LuxParserSpec extends AnyFunSuite {
  test("leaf comparators") {
    assert(LuxQL.parse("""name="widget"""") ===
      Leaf("name", "=", "widget", 0L, isNum = false))
    assert(LuxQL.parse("num>40") === Leaf("num", ">", null, 40L, isNum = true))
    assert(LuxQL.parse("num<=-5") === Leaf("num", "<=", null, -5L, isNum = true))
  }

  test("boolean nesting with arity rules") {
    val ast = LuxQL.parse("""AND(etype="part", OR(num>40, num<10))""")
    assert(ast === Bool("AND", Seq(
      Leaf("etype", "=", "part", 0L, isNum = false),
      Bool("OR", Seq(
        Leaf("num", ">", null, 40L, isNum = true),
        Leaf("num", "<", null, 10L, isNum = true))))))
    assertThrows[Exception](LuxQL.parse("""AND(num>1)"""))
    assertThrows[Exception](LuxQL.parse("""NOT(num>1, num<2)"""))
  }

  test("relationship and inverse hops") {
    assert(LuxQL.parse("""suppliedBy(name="x")""") ===
      Rel("suppliedBy", Leaf("name", "=", "x", 0L, isNum = false)))
    assert(LuxQL.parse("""^placedBy(etype="order")""") ===
      InvRel("placedBy", Leaf("etype", "=", "order", 0L, isNum = false)))
  }

  test("whitespace-insensitive; errors on malformed input") {
    assert(LuxQL.parse("""AND( num>1 ,  num<5 )""") ===
      Bool("AND", Seq(Leaf("num", ">", null, 1L, isNum = true),
        Leaf("num", "<", null, 5L, isNum = true))))
    assertThrows[Exception](LuxQL.parse("""AND(num>1"""))
    assertThrows[Exception](LuxQL.parse(""""unterminated"""))
    assertThrows[Exception](LuxQL.parse("""name="x" extra"""))
  }
}
