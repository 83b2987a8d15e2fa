package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F8: the URI canonicalizer — a re-expression of the reference's
  * `config.canonicalize` / `split_uri` / `fix_identifier`
  * (`pipeline/config.py:171-245`).
  *
  * Implemented as a native Catalyst expression (`uri_canon`) whose
  * codegen emits one static JVM call per row — the same shape as the
  * built-in regexp expressions. A pure Column when-chain was tried
  * first and rejected: the two-level source routing references its
  * input multiplicatively, and after projection collapse the expression
  * tree grows to ~10^5 nodes and OOMs the optimizer. The expression
  * stays inside whole-stage codegen (no UDF plumbing, no boxing), is
  * shuffle-free, and the routing table is compile-time config
  * (config-as-data, SURVEY §1.3).
  *
  * Semantics (config.py):
  *   1. external_uri_rewrites: first contained `bad` substring is
  *      replaced (`:231-234`);
  *   2. pre_split fix: `page/aat` / `aat/page` → `aat` (`:188-195`);
  *   3. source routing: first source with a contained `matches`
  *      substring wins; identifier = text after the LAST occurrence
  *      (`rsplit(m, 1)[1]`, `:197-216`);
  *   4. double-wrapped identifiers (an http(s) URI after the match)
  *      re-enter the splitter (`:218-220`);
  *   5. fix_identifier: trim, drop spaces and straight/curly quotes,
  *      strip one trailing `/` OR all `.html` when trailing
  *      (`:172-186`); an empty identifier kills the match;
  *   6. no source: URIs containing an other_external_matches substring
  *      pass through unchanged (post-rewrite), everything else is
  *      trashed to NULL (`:236-243`).
  */
object UriCanon {

  final case class Source(name: String, namespace: String, matches: Seq[String])

  /** Source routing table, modeled on the reference's sample_config
    * (docs/sample_config/{aat,ulan,tgn,wikidata,lcnaf,lcsh,viaf,
    * geonames,wof}.json) — order matters: first match wins. */
  val sources: Seq[Source] = Seq(
    Source("aat", "http://vocab.getty.edu/aat/", Seq("vocab.getty.edu/aat/")),
    Source("ulan", "http://vocab.getty.edu/ulan/", Seq("vocab.getty.edu/ulan/")),
    Source("tgn", "http://vocab.getty.edu/tgn/", Seq("vocab.getty.edu/tgn/")),
    Source("wikidata", "http://www.wikidata.org/entity/",
      Seq("wikidata.org/entity/", "wikidata.org/wiki/")),
    Source("lcnaf", "http://id.loc.gov/authorities/names/",
      Seq("id.loc.gov/authorities/names/")),
    Source("lcsh", "http://id.loc.gov/authorities/subjects/",
      Seq("id.loc.gov/authorities/subjects/")),
    Source("viaf", "https://viaf.org/viaf/", Seq("viaf.org/viaf/")),
    Source("geonames", "https://sws.geonames.org/", Seq("geonames.org/")),
    Source("wof", "https://data.whosonfirst.org/", Seq("whosonfirst.org/")))

  /** base.json:71 — bad → good substring rewrites, first hit wins. */
  val rewrites: Seq[(String, String)] =
    Seq("http://isni-url.oclc.nl/isni/" -> "http://isni.org/isni/")

  /** base.json:60 — recognized-but-unrouted externals pass through. */
  val otherExternal: Seq[String] = Seq("libris.kb.se/", "n2t.net/ark:/99166/",
    "isni.org/isni", "worldcat.org/fast/", "datos.bne.es", "www.gbif.org",
    "creativecommons.org", "rightsstatements.org")

  private val pairs: Array[(String, String)] =
    sources.flatMap(s => s.matches.map(m => (m, s.namespace))).toArray

  /** The reference strips identifiers with Python `str.strip()`
    * (config.py:172), whose no-arg whitespace set is Unicode — `\t \n
    * \v \f \r \x1c-\x1f space NEL NBSP` plus the Zs/Zl/Zp blocks —
    * NOT Java's `String.trim` (≤ U+0020 only) and not
    * `Character.isWhitespace` (which excludes the non-breaking family
    * U+00A0/U+2007/U+202F). Found by f8b_uri_diff construction: an
    * NBSP-edged identifier survived the old `trim` but not the
    * reference. The same code-point list drives the differential
    * oracle's `trim(x, …)` char set. */
  val pyWhitespace: Seq[Int] =
    Seq(0x09, 0x0a, 0x0b, 0x0c, 0x0d, 0x1c, 0x1d, 0x1e, 0x1f, 0x20,
      0x85, 0xa0, 0x1680) ++ (0x2000 to 0x200a) ++
      Seq(0x2028, 0x2029, 0x202f, 0x205f, 0x3000)
  private val pyWsSet: java.util.BitSet = {
    val b = new java.util.BitSet(0x3001)
    pyWhitespace.foreach(b.set)
    b
  }

  /** Python str.strip() over the BMP whitespace set above. */
  def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && pyWsSet.get(s.charAt(a).toInt)) a += 1
    while (b > a && pyWsSet.get(s.charAt(b - 1).toInt)) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** fix_identifier (config.py:172-186). Returns "" for dead ids. */
  def fixIdentifier(id0: String): String = {
    var id = pyStrip(id0).replace(" ", "").replace("\"", "").replace("”", "")
    if (id.endsWith("/")) id = id.substring(0, id.length - 1)
    else if (id.endsWith(".html")) id = id.replace(".html", "")
    id
  }

  /** pre_split_fix_uri (config.py:188-195). */
  private def preFix(u: String): String =
    if (u.contains("page/aat")) u.replace("page/aat", "aat")
    else if (u.contains("aat/page")) u.replace("aat/page", "aat")
    else u

  /** split_uri (config.py:197-226): canonical string or null. */
  @annotation.tailrec
  def splitUri(u0: String): String = {
    val u = preFix(u0)
    var i = 0
    var m: String = null
    var ns: String = null
    while (i < pairs.length && m == null) {
      if (u.contains(pairs(i)._1)) { m = pairs(i)._1; ns = pairs(i)._2 }
      i += 1
    }
    if (m == null) null
    else {
      val id0 = u.substring(u.lastIndexOf(m) + m.length)
      if (id0.startsWith("http://") || id0.startsWith("https://")) splitUri(id0)
      else {
        val fixed = fixIdentifier(id0)
        if (fixed.isEmpty) null else ns + fixed
      }
    }
  }

  /** canonicalize (config.py:228-244): canonical string or null. */
  def canonicalizeJvm(uri0: String): String = {
    var uri = uri0
    var i = 0
    var done = false
    while (i < rewrites.length && !done) {
      val (bad, good) = rewrites(i)
      if (uri.contains(bad)) { uri = uri.replace(bad, good); done = true }
      i += 1
    }
    val routed = splitUri(uri)
    if (routed != null) routed
    else if (otherExternal.exists(uri.contains)) uri
    else null
  }

  /** Column wrapper over the native expression. */
  def canonicalize(c: Column): Column =
    org.apache.spark.sql.functions.call_function("uri_canon", c)

  /** Register as SQL function `uri_canon` on a session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "uri_canon", args => UriCanonExpr(args.head), "built-in")
}

/** Native codegen'd expression: one static call per row; NULL output for
  * trashed URIs (hence custom nullability handling). */
final case class UriCanonExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"uri_canon requires STRING input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val r = UriCanon.canonicalizeJvm(input.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("canon")
      s"""
         |String $r = graft.functions.UriCanon.canonicalizeJvm($c.toString());
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UriCanonExpr =
    copy(child = newChild)
}
