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
  private val stripSet: Set[Char] = (" \t\n\r" + punct).toSet

  /** sanitize_uri (`:55-64`). */
  def sanitizeUri(uri: String): String =
    if (uri == null) ""
    else uri.replace("\r", "").replace("\"", "")
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
      val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
      str = nfd.filterNot(c =>
        Character.getType(c) == Character.NON_SPACING_MARK)
    }
    if (minWordChars > 1)
      str = str.split("\\s+").filter(_.nonEmpty).map { w =>
        val stripped = w.dropWhile(stripSet).reverse
          .dropWhile(stripSet).reverse
        stripped.padTo(minWordChars, paddingChar).mkString
      }.mkString(" ")
    str
  }
}
