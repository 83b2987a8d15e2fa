package graft.plans

/** The LUX-style search-language front end (SURVEY §2.9) — a brand-new
  * Scala re-expression of the reference's query surface: lexer
  * (`pipeline/storage/marklogic/query_token_rules.py`), string parser + AST
  * (`pipeline/storage/marklogic/ml_lexer.py:154-588`), JSON parser
  * (`ml_lexer.py:324-405`). Instead of compiling to cts JavaScript the
  * AST compiles to DataFrame combinators (LuxCompiler).
  *
  * Grammar (string form; boolean set per query_token_rules.py:7):
  *   query   := bool | rel | invrel | leaf
  *   bool    := ("AND"|"OR"|"NOT"|"NEAR"|"BOOST"|"ANDNOT")
  *              "(" query ("," query)* ")"
  *   rel     := IDENT "(" query ")"          -- relationship hop
  *   invrel  := "^" IDENT "(" query ")"      -- inverse hop
  *   leaf    := IDENT ("="|"<"|">"|"<="|">=") (QUOTED | NUMBER)
  *
  * JSON form (ml_lexer.py:324-405): a clause is a one-field object
  * `{field: value}` plus `_`-prefixed params; list value = boolean
  * (AND/OR/NEAR/ANDNOT/BOOST, `:328`), object value = relationship
  * (`^` prefix = inverse), scalar value = leaf with optional `_comp`
  * comparator param.
  */
object LuxQL {

  /** Boolean operators of the string grammar. */
  val booleans: Set[String] = Set("AND", "OR", "NOT", "NEAR", "BOOST", "ANDNOT")

  /** Boolean operators of the JSON grammar (ml_lexer.py:328 — NOT is
    * spelled ANDNOT there). */
  val jsonBooleans: Set[String] = Set("AND", "OR", "NEAR", "ANDNOT", "BOOST")

  sealed trait Ast
  /** `stemmed`: the cts word-query `stemmed` option, carried by the
    * JSON form's `_stemmed` param (ml_lexer.py:391-392; option list
    * cts.py:2). Wildcards need no flag — a `*`/`?` in the term
    * activates the `wildcarded` option, matching MarkLogic's
    * automatic wildcard detection. `contains`: the `_contains` param —
    * an engine extension escaping the cts tokenized default back to
    * raw substring match (useful for id fragments / partial codes the
    * tokenizer would split differently). */
  final case class Leaf(field: String, op: String, str: String, num: Long,
      isNum: Boolean, stemmed: Boolean = false,
      contains: Boolean = false) extends Ast
  final case class Bool(op: String, kids: Seq[Ast]) extends Ast
  final case class Rel(pred: String, sub: Ast) extends Ast
  final case class InvRel(pred: String, sub: Ast) extends Ast

  // ------------------------------------------------------------ lexer
  sealed trait Tok
  private case class TWord(s: String) extends Tok
  private case class TQuoted(s: String) extends Tok
  private case class TNum(n: Long) extends Tok
  private case class TOp(s: String) extends Tok
  private case object TLParen extends Tok
  private case object TRParen extends Tok
  private case object TComma extends Tok
  private case object TCaret extends Tok

  def tokenize(s: String): Seq[Tok] = {
    val out = scala.collection.mutable.ArrayBuffer[Tok]()
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += TLParen; i += 1 }
      else if (c == ')') { out += TRParen; i += 1 }
      else if (c == ',') { out += TComma; i += 1 }
      else if (c == '^') { out += TCaret; i += 1 }
      else if (c == '"') {
        val j = s.indexOf('"', i + 1)
        require(j > 0, s"unterminated quote at $i")
        out += TQuoted(s.substring(i + 1, j)); i = j + 1
      } else if (c == '<' || c == '>' || c == '=') {
        if (i + 1 < s.length && s(i + 1) == '=') { out += TOp(s"${c}="); i += 2 }
        else { out += TOp(c.toString); i += 1 }
      } else if (c.isDigit || (c == '-' && i + 1 < s.length && s(i + 1).isDigit)) {
        val j = (i + 1 until s.length).find(k => !s(k).isDigit).getOrElse(s.length)
        out += TNum(s.substring(i, j).toLong); i = j
      } else if (c.isLetter || c == '_') {
        // ':' inside a word supports namespaced predicates (lux:any)
        val j = (i until s.length).find(k =>
          !(s(k).isLetterOrDigit || s(k) == '_' || s(k) == ':'))
          .getOrElse(s.length)
        out += TWord(s.substring(i, j)); i = j
      } else sys.error(s"unexpected char '$c' at $i")
    }
    out.toSeq
  }

  // ------------------------------------------------------------ parser

  /** Max nesting depth for both parsers. A recursive-descent parser
    * with no bound dies of StackOverflowError on `"AND(" * 50000` — a
    * VirtualMachineError that sails past any NonFatal handler and
    * kills the task; untrusted query strings must instead fail with a
    * catchable parse error. 200 is far beyond any legitimate query. */
  val MaxDepth = 200

  def parse(s: String): Ast = {
    val toks = tokenize(s)
    val (ast, rest) = parseQuery(toks, 0)
    require(rest.isEmpty, s"trailing tokens: $rest")
    ast
  }

  private def parseQuery(t: Seq[Tok], depth: Int): (Ast, Seq[Tok]) = {
    if (depth > MaxDepth) sys.error(s"query nesting exceeds $MaxDepth")
    t match {
    case TCaret +: TWord(p) +: TLParen +: rest =>
      val (sub, r2) = parseQuery(rest, depth + 1)
      (InvRel(p, sub), expect(r2, TRParen))
    case TWord(op) +: TLParen +: rest if booleans(op) =>
      var kids = Vector[Ast]()
      var r = rest
      var done = false
      while (!done) {
        val (k, r2) = parseQuery(r, depth + 1)
        kids :+= k
        r2 match {
          case TComma +: tail => r = tail
          case TRParen +: tail => r = tail; done = true
          case other => sys.error(s"expected , or ) got $other")
        }
      }
      if (op == "NOT") require(kids.size == 1, "NOT takes exactly one child")
      else if (op == "BOOST" || op == "ANDNOT")
        require(kids.size == 2, s"$op takes exactly two children")
      else require(kids.size >= 2, s"$op takes at least two children")
      (Bool(op, kids), r)
    case TWord(f) +: TOp(op) +: TQuoted(v) +: rest =>
      require(op == "=", s"string field $f only supports =")
      (Leaf(f, op, v, 0L, isNum = false), rest)
    case TWord(f) +: TOp(op) +: TNum(n) +: rest =>
      (Leaf(f, op, null, n, isNum = true), rest)
    case TWord(p) +: TLParen +: rest =>
      val (sub, r2) = parseQuery(rest, depth + 1)
      (Rel(p, sub), expect(r2, TRParen))
    case other => sys.error(s"cannot parse at $other")
    }
  }

  private def expect(t: Seq[Tok], tok: Tok): Seq[Tok] = t match {
    case `tok` +: rest => rest
    case other => sys.error(s"expected $tok got $other")
  }

  // ------------------------------------------------- JSON parser (Q2)

  /** Parse the JSON query form (ml_lexer.py:324-405). Uses json4s,
    * which ships with Spark. `_scope` at the top level is accepted and
    * ignored (class scoping is the catalog's job here). */
  def parseJson(s: String): Ast = {
    import org.json4s._
    fromJson(org.json4s.jackson.JsonMethods.parse(s), 0)
  }

  private def fromJson(v: org.json4s.JValue, depth: Int): Ast = {
    import org.json4s._
    if (depth > MaxDepth) sys.error(s"query nesting exceeds $MaxDepth")
    v match {
      case JObject(fields) =>
        val (params, main) = fields
          .filterNot(_._1 == "_scope")
          .partition(_._1.startsWith("_"))
        require(main.size == 1,
          s"ambiguous clause with multiple types: ${main.map(_._1).mkString(",")}")
        val (field, value) = main.head
        val comp = params.collectFirst { case ("_comp", JString(c)) => c }
          .getOrElse("=")
        val stemmed = params.collectFirst {
          case ("_stemmed", JBool(b)) => b
        }.getOrElse(false)
        val contains = params.collectFirst {
          case ("_contains", JBool(b)) => b
        }.getOrElse(false)
        value match {
          case JArray(items) =>
            require(jsonBooleans(field), s"unknown Boolean $field")
            items.foreach {
              case _: JObject => ()
              case other => sys.error(s"a raw value cannot be in a Boolean: $other")
            }
            Bool(field, items.map(fromJson(_, depth + 1)))
          case o: JObject =>
            if (field.startsWith("^")) InvRel(field.drop(1), fromJson(o, depth + 1))
            else Rel(field, fromJson(o, depth + 1))
          case JString(sv) =>
            require(comp == "=", s"string field $field only supports =")
            Leaf(field, "=", sv, 0L, isNum = false, stemmed = stemmed,
              contains = contains)
          case JInt(n) => Leaf(field, comp, null, n.toLong, isNum = true)
          case JLong(n) => Leaf(field, comp, null, n, isNum = true)
          case JDouble(d) => Leaf(field, comp, null, d.toLong, isNum = true)
          case other => sys.error(s"unsupported clause value: $other")
        }
      case other => sys.error(s"query clause must be an object, got $other")
    }
  }
}
