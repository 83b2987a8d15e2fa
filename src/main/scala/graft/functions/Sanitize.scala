package graft.functions

import java.text.Normalizer

/** The qlever text-index sanitizers
  * (`pipeline/sources/lux/qlever/mapper2.py:55-88`) — the normalization
  * every literal passes through before landing in the full-text index:
  *
  *   - sanitize_uri (`:55-64`): strip \r and double quotes, %-encode
  *     curly braces (the two characters that break N-Triples IRIs);
  *   - sanitize_string (`:66-88`): lowercase; \r \n \t → space; drop
  *     double quotes and backslashes; hyphen → space (compound words
  *     tokenize apart); optionally NFD-decompose and drop combining
  *     marks (category Mn — the `remove_diacritics` knob, default off);
  *     optionally re-tokenize on whitespace runs and right-pad each
  *     punctuation-stripped word to `min_word_chars` with the padding
  *     char (default 'þ' — qlever's wildcard-prefix minimum, knob
  *     default 0 = off).
  *
  * Order matters and is kept verbatim: replacements, then diacritics,
  * then padding (so 'déjà-vu' tokenizes as two words BEFORE folding). */
object Sanitize {

  val PaddingChar: Char = 'þ' // mapper2.py:28

  private val punct = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
  // Python's string.whitespace — \u000b (VT) and \u000c (FF) included,
  // spelled as ESCAPES: the pre-r15 source embedded them as raw control
  // characters, invisible to any reader auditing parity against the
  // reference's word.strip(whitespace + punctuation) (mapper2.py:84).
  private val stripSet: Set[Char] =
    (" \t\n\r\u000b\u000c" + punct).toSet

  /** Python no-arg `str.split()` splits on UNICODE whitespace — the
    * same code-point set as str.strip() (shared from
    * [[UriCanon.pyWhitespace]]) — where Java's `\\s+` is ASCII-only: a
    * NBSP- or ideographic-space-joined pair is TWO words to the
    * reference and was one to the engine (found by f18b_sanitize_diff
    * construction). All set members are BMP, so a char loop suffices. */
  private val pyWsChars: Set[Char] =
    UriCanon.pyWhitespace.map(_.toChar).toSet
  private def pySplit(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val b = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (pyWsChars(c)) { if (b.length > 0) { out += b.toString; b.setLength(0) } }
      else b.append(c)
      i += 1
    }
    if (b.length > 0) out += b.toString
    out.result()
  }

  /** Python `ljust` pads to a CODE-POINT count; String.padTo counts
    * chars, shorting supplementary-plane words by one pad per
    * surrogate pair (f18b's find — the Porter q10 non-BMP class). */
  private def ljust(w: String, n: Int, pad: Char): String = {
    val cps = w.codePointCount(0, w.length)
    if (cps >= n) w else w + pad.toString * (n - cps)
  }

  /** sanitize_uri (`mapper2.py:79-89`): external links %-encode spaces,
    * drop \n \t \r and double quotes, %-encode curly braces; URIs
    * under the pipeline's own namespace (`internalPrefix`, the
    * reference's datans gate at `:80`) pass through untouched.
    * (Previously only the \r/quote/brace subset — the space/%20 and
    * \n/\t drops and the internal bypass are f18b round-14 parity
    * fixes against `mapper2.py:79-89`.) */
  def sanitizeUri(uri: String, internalPrefix: String = ""): String =
    if (uri == null) ""
    else if (internalPrefix.nonEmpty && uri.startsWith(internalPrefix)) uri
    else uri.replace(" ", "%20").replace("\n", "").replace("\t", "")
      .replace("\r", "").replace("\"", "")
      .replace("{", "%7B").replace("}", "%7D")

  /** sanitize_string (`:66-88`), knobs as parameters (reference reads
    * them from config; defaults mirror `:25-28`). */
  def sanitizeString(s: String, removeDiacritics: Boolean = false,
      minWordChars: Int = 0, paddingChar: Char = PaddingChar): String = {
    if (s == null || s.isEmpty) return ""
    var str = s.toLowerCase(java.util.Locale.ROOT)
      .replace("\r", " ").replace("\n", " ").replace("\t", " ")
      .replace("\"", "").replace("\\", "").replace("-", " ")
    if (removeDiacritics) {
      // CODE-POINT iteration: the reference filters unicodedata
      // category Mn, which includes supplementary-plane marks (musical
      // combining, variation selectors 17+); a per-char filter sees
      // surrogates (type SURROGATE, not Mn) and keeps them — f18b's
      // find, the same non-BMP class Porter's q10 fixed in round 13.
      val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
      val b = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val cp = nfd.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          b.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      str = b.toString
    }
    if (minWordChars > 1)
      str = pySplit(str).map { w =>
        val stripped = w.dropWhile(stripSet).reverse
          .dropWhile(stripSet).reverse
        ljust(stripped.mkString, minWordChars, paddingChar)
      }.mkString(" ")
    str
  }
}
