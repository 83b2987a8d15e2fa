package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Sanitize

/** qlever text-index sanitizers (qlever/mapper2.py:55-88). */
class SanitizeSpec extends AnyFunSuite {

  test("sanitize_uri strips CR and quotes, encodes braces") {
    assert(Sanitize.sanitizeUri("https://x.org/{q}\r") === "https://x.org/%7Bq%7D")
    assert(Sanitize.sanitizeUri("a\"b") === "ab")
    assert(Sanitize.sanitizeUri(null) === "")
  }

  test("sanitize_uri: %20 spaces, \\n \\t drops, internal-namespace bypass") {
    // mapper2.py:79-89 — the f18b round-14 parity fixes
    assert(Sanitize.sanitizeUri("https://x.org/a b\n\t{c}") ===
      "https://x.org/a%20b%7Bc%7D")
    assert(Sanitize.sanitizeUri("https://d/data/x {y}", "https://d/data/") ===
      "https://d/data/x {y}") // internal URIs pass through untouched
  }

  test("python parity: unicode split, codepoint ljust, supplementary Mn") {
    // str.split() breaks on NBSP; Java \\s+ did not (f18b's find)
    assert(Sanitize.sanitizeString("a b", minWordChars = 3) === "aþþ bþþ")
    // ljust counts code points: 𝕓 is ONE short word, two pads
    assert(Sanitize.sanitizeString("𝕓", minWordChars = 3) ===
      "𝕓þþ")
    // supplementary-plane Mn (musical combining) is dropped like BMP Mn
    assert(Sanitize.sanitizeString("x𝅧",
      removeDiacritics = true) === "x")
    // Mc (spacing mark) survives — the filter is Mn-ONLY, like Python
    assert(Sanitize.sanitizeString("xा", removeDiacritics = true) ===
      "xा")
  }

  test("default path: lowercase + control/quote/backslash/hyphen rules only") {
    assert(Sanitize.sanitizeString("A\tB\nC\rD") === "a b c d")
    assert(Sanitize.sanitizeString("""say "Hi"\now""") === "say hinow")
    assert(Sanitize.sanitizeString("déjà-vu") === "déjà vu") // accents kept
    assert(Sanitize.sanitizeString("") === "")
    assert(Sanitize.sanitizeString(null) === "")
  }

  test("diacritics fold via NFD, base letters survive") {
    assert(Sanitize.sanitizeString("Crème Brûlée Ñaño",
      removeDiacritics = true) === "creme brulee nano")
    // thorn is a letter, not a combining mark — never folded
    assert(Sanitize.sanitizeString("þorn", removeDiacritics = true) === "þorn")
  }

  test("min-word padding: strip punctuation ends, ljust with thorn, no truncation") {
    assert(Sanitize.sanitizeString("a bc!! longword", minWordChars = 3) ===
      "aþþ bcþ longword") // ljust never truncates
    // a fully-punctuation word collapses to pure padding
    assert(Sanitize.sanitizeString("x ::", minWordChars = 3) === "xþþ þþþ")
    // whitespace runs collapse before padding (python str.split())
    assert(Sanitize.sanitizeString("a    b", minWordChars = 2) === "aþ bþ")
  }

  test("rule order: hyphen tokenizes before folding and padding") {
    assert(Sanitize.sanitizeString("Déjà-Vu", removeDiacritics = true,
      minWordChars = 4) === "dejaþ".take(4) + " " + "vuþþ")
  }
}
