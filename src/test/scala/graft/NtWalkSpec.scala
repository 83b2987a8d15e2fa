package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.NtWalk
import graft.pipeline.NtWalk.Nt
import graft.pipeline.MlMapper.{InternalPfx => I}

/** M15 walk fixtures (qlever/mapper.py:210-379). */
class NtWalkSpec extends AnyFunSuite {

  test("refs collect internal ids outside ignored props; root excluded") {
    val (_, refs) = NtWalk.transform(
      s"""{"id": "${I}a", "type": "Person",
         |"carried_out": [{"type": "Activity",
         |  "took_place_at": [{"id": "${I}p1", "type": "Place"}]}],
         |"equivalent": [{"id": "${I}dupe", "type": "Person"}]}""".stripMargin)
    assert(refs == Seq(I + "p1")) // equivalent subtree is ignored for refs
  }

  test("bnode ids mint in walk order off the record base") {
    val (ts, _) = NtWalk.transform(
      s"""{"id": "${I}x", "type": "Place",
         |"identified_by": [{"type": "Name", "content": "A"},
         |                  {"type": "Identifier", "content": "B"}]}""".stripMargin)
    assert(ts.contains(Nt(s"${I}x", "crm:P1_is_identified_by", s"${I}x_0", "uri")))
    assert(ts.contains(Nt(s"${I}x_1", "rdf:type", "crm:E42_Identifier", "uri")))
  }

  test("part/part_of predicates depend on the node's class") {
    assert(NtWalk.partPred("Name", "part") == "crm:P106_is_composed_of")
    assert(NtWalk.partPred("Production", "part_of") == "crm:P9i_forms_part_of")
    assert(NtWalk.partPred("Place", "part") == "crm:P89i_contains")
    assert(NtWalk.partPred("Material", "part_of") == "skos:narrower")
    assert(NtWalk.partPred("Bogus", "part") == "lux:part")
  }

  test("member_of falls back to the node's own class when untyped") {
    val (ts, _) = NtWalk.transform(
      s"""{"id": "${I}g", "type": "Group",
         |"member_of": [{"id": "${I}g2"}]}""".stripMargin)
    assert(ts.exists(t =>
      t.predicate == "crm:P107i_is_current_or_former_member_of" &&
        t.obj == I + "g2"))
  }

  test("numeric values and literal escaping; NT rendering") {
    val (ts, _) = NtWalk.transform(
      s"""{"id": "${I}d", "type": "Dimension", "value": 42,
         |"identified_by": [{"type": "Name", "content": "a\\tb"}]}""".stripMargin)
    assert(ts.contains(Nt(s"${I}d", "crm:P90_has_value", "42", "literal")))
    assert(ts.exists(t => t.obj == "a\\tb" && t.kind == "literal"))
    assert(NtWalk.render(Nt("s", "p", "o", "uri")) == "<s> <p> <o> .")
    assert(NtWalk.render(Nt("s", "p", "1900", "date")) ==
      """<s> <p> "1900"^^<http://www.w3.org/2001/XMLSchema#dateTime> .""")
    assert(NtWalk.render(Nt("s", "p", "v", "literal")) == """<s> <p> "v" .""")
  }

  test("external URIs sanitize; unknown properties and classes skip") {
    val (ts, _) = NtWalk.transform(
      s"""{"id": "${I}x", "type": "Person",
         |"equivalent": [{"id": "http://e.org/a b", "type": "NotAClass"}],
         |"frob_prop": [{"id": "${I}y", "type": "Person"}]}""".stripMargin)
    assert(ts.exists(t => t.obj == "http://e.org/a%20b"))
    assert(!ts.exists(t => t.predicate.contains("frob")))
    assert(!ts.exists(t => t.obj == "NotAClass"))
  }

  test("malformed records yield empty triples instead of failing the stage") {
    assert(NtWalk.transform("not json at all") === ((Nil, Nil)))
    assert(NtWalk.transform("[1, 2]") === ((Nil, Nil))) // non-object root
    assert(NtWalk.transform("""{"type": "Person"}""") === ((Nil, Nil))) // no id
  }
}
