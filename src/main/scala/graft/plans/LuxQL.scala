package graft.plans

/** The LUX-style search-language front end (SURVEY §2.9) — a brand-new
  * Scala re-expression of the reference's query surface: lexer
  * (`pipeline/storage/marklogic/query_token_rules.py`), string parser + AST
  * (`pipeline/storage/marklogic/ml_lexer.py:154-588`). Instead of compiling
  * to cts JavaScript the AST compiles to DataFrame combinators
  * (LuxCompiler).
  *
  * Grammar (string form):
  *   query   := bool | rel | invrel | leaf
  *   bool    := ("AND"|"OR"|"NOT") "(" query ("," query)* ")"
  *   rel     := IDENT "(" query ")"          -- relationship hop
  *   invrel  := "^" IDENT "(" query ")"      -- inverse hop
  *   leaf    := IDENT ("="|"<"|">"|"<="|">=") (QUOTED | NUMBER)
  */
object LuxQL {

  sealed trait Ast
  final case class Leaf(field: String, op: String, str: String, num: Long,
      isNum: Boolean) extends Ast
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
  def parse(s: String): Ast = {
    val toks = tokenize(s)
    val (ast, rest) = parseQuery(toks)
    require(rest.isEmpty, s"trailing tokens: $rest")
    ast
  }

  private def parseQuery(t: Seq[Tok]): (Ast, Seq[Tok]) = t match {
    case TCaret +: TWord(p) +: TLParen +: rest =>
      val (sub, r2) = parseQuery(rest)
      (InvRel(p, sub), expect(r2, TRParen))
    case TWord(op) +: TLParen +: rest if Set("AND", "OR", "NOT")(op) =>
      var kids = Vector[Ast]()
      var r = rest
      var done = false
      while (!done) {
        val (k, r2) = parseQuery(r)
        kids :+= k
        r2 match {
          case TComma +: tail => r = tail
          case TRParen +: tail => r = tail; done = true
          case other => sys.error(s"expected , or ) got $other")
        }
      }
      if (op == "NOT") require(kids.size == 1, "NOT takes exactly one child")
      else require(kids.size >= 2, s"$op takes at least two children")
      (Bool(op, kids), r)
    case TWord(f) +: TOp(op) +: TQuoted(v) +: rest =>
      require(op == "=", s"string field $f only supports =")
      (Leaf(f, op, v, 0L, isNum = false), rest)
    case TWord(f) +: TOp(op) +: TNum(n) +: rest =>
      (Leaf(f, op, null, n, isNum = true), rest)
    case TWord(p) +: TLParen +: rest =>
      val (sub, r2) = parseQuery(rest)
      (Rel(p, sub), expect(r2, TRParen))
    case other => sys.error(s"cannot parse at $other")
  }

  private def expect(t: Seq[Tok], tok: Tok): Seq[Tok] = t match {
    case `tok` +: rest => rest
    case other => sys.error(s"expected $tok got $other")
  }
}
