package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Porter

/** Pins classic Porter (Porter 1980, "An algorithm for suffix
  * stripping") against the paper's own step examples, plus the
  * C-implementation conventions the Scaladoc documents (length <= 2
  * unchanged; longest-suffix election with no fallback). The DuckDB
  * oracle side re-derives the same chain in SQL (Porter.sqlCtes),
  * checked end-to-end by lux_q10_stemmed's correctness row. */
class PorterSpec extends AnyFunSuite {

  private def check(pairs: (String, String)*): Unit =
    pairs.foreach { case (in, want) =>
      assert(Porter.stem(in) === want, s"stem($in)")
    }

  test("step 1a: plurals (paper examples)") {
    check("caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat")
  }

  test("step 1b: eed/ed/ing with cleanup (paper examples)") {
    check("feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      // cleanup rules: at/bl/iz +e, double-consonant undoubling, cvc +e
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file")
    // note: agreed -> agree -> (5a m=1, "agre" ends vcc not cvc) -> agre;
    // conflated -> conflate -> 5a drops the e the 1b cleanup restored
    // (m("conflat") = 2) — both exactly per the full-chain algorithm
  }

  test("step 1c: y -> i after a vowel-bearing stem") {
    check("happy" -> "happi", "sky" -> "sky")
  }

  test("step 2 suffix map (paper examples)") {
    check("relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration",
      "valenci" -> "valenc", "hesitanci" -> "hesit",
      "digitizer" -> "digit", "conformabli" -> "conform",
      "radicalli" -> "radic", "differentli" -> "differ",
      "vileli" -> "vile", "analogousli" -> "analog",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl")
    // (outputs are the FULL chain's: step 2 rewrites then steps 3-5
    // keep stripping, e.g. relational -> relate -> relat)
  }

  test("step 3 suffix map (paper examples, full chain)") {
    check("triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good")
  }

  test("step 4 deletions need m > 1; ion needs *S or *T") {
    check("revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
      "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "communism" -> "commun", "activate" -> "activ",
      "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      // m = 1 stem: suffix survives
      "allowance" -> "allow", "rate" -> "rate")
  }

  test("step 5: final e and -ll") {
    check("probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
  }

  test("conventions: short words unchanged; non-letters are consonants") {
    check("a" -> "a", "is" -> "is", "s" -> "s", "" -> "")
    assert(Porter.stem(null) === null)
    // WordFold tokens can carry digits; they classify as consonants
    // and flow through untouched
    check("x86s" -> "x86", "2024" -> "2024")
  }

  test("fixture vocabulary: the lux_q10 family folds together") {
    check("merges" -> "merg", "merge" -> "merg", "merged" -> "merg",
      "merging" -> "merg", "queries" -> "queri", "query" -> "queri",
      "scans" -> "scan", "scanning" -> "scan")
  }

  test("idempotent on its own output over the paper vectors") {
    // stems are fixpoints for this vocabulary — a regression here
    // usually means a step fires on already-stemmed forms
    val vocab = Seq("caresses", "ponies", "relational", "conditional",
      "vietnamization", "triplicate", "replacement", "controll",
      "hopefulness", "electriciti", "adjustable", "probate")
    vocab.foreach { w =>
      val s = Porter.stem(w)
      assert(Porter.stem(s) === s, s"stem not idempotent on $w -> $s")
    }
  }
}
