package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.UriCanon

/** Edge cases for the F8 canonicalizer (config.py:171-245), plus the
  * codegen path through the registered `uri_canon` expression. */
class UriCanonSpec extends AnyFunSuite {
  private def c(u: String): String = UriCanon.canonicalizeJvm(u)

  test("direct match rebuilds on the source namespace") {
    assert(c("https://www.geonames.org/2950159") ==
      "https://sws.geonames.org/2950159")
  }

  test("page/aat pre-split fix") {
    assert(c("http://vocab.getty.edu/page/aat/300404670") ==
      "http://vocab.getty.edu/aat/300404670")
    assert(c("http://vocab.getty.edu/aat/page/300404670") ==
      "http://vocab.getty.edu/aat/300404670")
  }

  test("identifier fixes: trailing slash, trailing .html, quotes, spaces") {
    assert(c("http://id.loc.gov/authorities/names/n79022889/") ==
      "http://id.loc.gov/authorities/names/n79022889")
    assert(c("https://viaf.org/viaf/75121530.html") ==
      "https://viaf.org/viaf/75121530")
    assert(c("https://viaf.org/viaf/7512\"1530”") ==
      "https://viaf.org/viaf/75121530")
    assert(c("http://www.wikidata.org/wiki/Q 937") ==
      "http://www.wikidata.org/entity/Q937")
  }

  test("identifier strip is Python str.strip(): Unicode whitespace edges") {
    // the reference's fix_identifier strips with str.strip()
    // (config.py:172) whose set is Unicode whitespace — NBSP, narrow
    // NBSP, ideographic space — not Java trim's <= U+0020
    assert(c("http://vocab.getty.edu/aat/\u00a0300123\t") ==
      "http://vocab.getty.edu/aat/300123")
    assert(c("http://vocab.getty.edu/aat/\u202f300124\u3000") ==
      "http://vocab.getty.edu/aat/300124")
    // an identifier that is ONLY such whitespace dies like an empty one
    assert(c("http://vocab.getty.edu/aat/\u00a0\u3000") == null)
    // interior NBSP is untouched: strip works on edges, and the
    // space-removal replace targets ASCII space only
    assert(c("http://vocab.getty.edu/aat/3\u00a04") ==
      "http://vocab.getty.edu/aat/3\u00a04")
  }

  test("trailing slash strip wins over .html (the reference's elif)") {
    assert(c("https://viaf.org/viaf/x.html/") ==
      "https://viaf.org/viaf/x.html")
  }

  test("first matching source wins; identifier after the LAST occurrence") {
    assert(c("https://example.org/geonames.org/geonames.org/42") ==
      "https://sws.geonames.org/42")
  }

  test("double-wrapped identifiers re-enter the splitter") {
    assert(c("https://viaf.org/viaf/http://vocab.getty.edu/aat/300000123") ==
      "http://vocab.getty.edu/aat/300000123")
  }

  test("rewrite table applies before routing") {
    assert(c("http://isni-url.oclc.nl/isni/0000000121032683") ==
      "http://isni.org/isni/0000000121032683")
  }

  test("other-external URIs pass through; junk is trashed; empty id dies") {
    assert(c("https://creativecommons.org/licenses/by/4.0/") ==
      "https://creativecommons.org/licenses/by/4.0/")
    assert(c("https://random.junk.example/1") == null)
    assert(c("http://vocab.getty.edu/aat/") == null)
  }

  test("canonicalization is idempotent over the full variant space") {
    // pipelines canonicalize defensively at several stages; a second
    // application must be a no-op (canon(canon(x)) == canon(x)) —
    // pinned over every variant family the fixture corpus exercises
    val r = new scala.util.Random(0xD1CE)
    val mk: Int => String = i => {
      val n = r.nextInt(100000)
      (i % 12) match {
        case 0 => s"http://vocab.getty.edu/aat/300$n"
        case 1 => s"https://vocab.getty.edu/page/aat/300$n"
        case 2 => s"http://www.wikidata.org/wiki/Q$n"
        case 3 => s"https://id.loc.gov/authorities/names/n$n/"
        case 4 => s"http://viaf.org/viaf/$n.html"
        case 5 => s"https://www.geonames.org/$n\""
        case 6 => s"http://isni-url.oclc.nl/isni/0000$n"
        case 7 => s"https://viaf.org/viaf/http://vocab.getty.edu/aat/300$n"
        case 8 => "https://creativecommons.org/licenses/by/4.0/"
        case 9 => s"https://random.junk.example/$n"
        case 10 => s"http://id.loc.gov/authorities/subjects/sh $n"
        case _ => s"https://d-nb.info/gnd/$n-$n"
      }
    }
    for (i <- 0 until 600) {
      val x = mk(i)
      val once = UriCanon.canonicalizeJvm(x)
      if (once != null)
        assert(UriCanon.canonicalizeJvm(once) === once,
          s"not idempotent for $x -> $once")
    }
  }

  test("codegen path produces the same results as the JVM function") {
    val spark = TestSpark.spark
    import spark.implicits._
    val in = Seq("http://vocab.getty.edu/page/aat/3001",
      "https://junk.example/x", "https://www.geonames.org/77/")
    val out = in.toDF("u")
      .select(UriCanon.canonicalize($"u").as("c")).as[String].collect()
    assert(out.toSeq == in.map(UriCanon.canonicalizeJvm))
  }
}
