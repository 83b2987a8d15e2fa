package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The cts word-query normalization fold — the `diacritic-insensitive,
  * punctuation-insensitive` members of the reference's default word
  * option list (`pipeline/storage/marklogic/cts.py:2`): NFD-decompose
  * and drop combining marks (all of Mn/Mc/Me), then replace every
  * char outside \pL ∪ \pN ∪ the ASCII [\t\n\f\r ] set with a SPACE —
  * punctuation is a TOKEN BREAK, exactly like the cts tokenizer
  * (which splits words at punctuation before applying
  * punctuation-insensitive matching), not a fused-out character. The
  * survivor class mirrors the oracle regex EXACTLY (lux_q14_fold_diff
  * pins it differentially): Nl/No number forms (Ⅷ, ², ½) survive
  * like RE2 \pN, and non-ASCII whitespace breaks tokens like RE2's
  * ASCII-only \s. So "Naïve-Bayes" folds to the tokens
  * [naive, bayes] and word-query "naive" (and phrase "naive bayes")
  * match the hyphenated text, as they do in the reference. (The
  * round-12 fold DELETED punctuation, fusing "naivebayes" into one
  * token — a documented-closed-but-actually-open deviation the
  * round-13 advice caught.) Applied to both the query term and the
  * indexed tokens on every token-level match path.
  *
  * DuckDB twin (oracle side): drop marks, then space the rest —
  * `regexp_replace(regexp_replace(strip_accents(x), '\pM', '', 'g'),
  * '[^\pL\pN\s]', ' ', 'g')`. The explicit mark-deletion pass mirrors
  * the JVM rule that a combining mark vanishes (diacritic fold) rather
  * than becoming a token break; both folds are NFD-based and agree on
  * the Latin ranges the data carries. Codegen: one static JVM call per
  * row (the UriCanon shape). */
object WordFold {
  def fold(s: String): String = {
    if (s == null) return null
    val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
    val b = new java.lang.StringBuilder(nfd.length)
    var i = 0
    // iterate CODE POINTS, not UTF-16 chars: supplementary-plane
    // letters are surrogate pairs, and the per-char classifier would
    // drop both halves while the oracle's RE2 \pL keeps the letter —
    // an engine/oracle divergence for any non-BMP text
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      // EVERY mark category vanishes (Mn/Mc/Me), matching the oracle's
      // '\pM' deletion pass: exempting only NON_SPACING_MARK would turn
      // a spacing combining mark (e.g. a Devanagari matra, category Mc)
      // into a token break here while DuckDB deletes it — an
      // engine/oracle split on any Indic-script field
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) {
        // the survivor class is EXACTLY the oracle's: \pL (isLetter =
        // L*) ∪ \pN (Nd via isDigit, PLUS Nl and No — isLetterOrDigit
        // alone would space out ², ½, Ⅷ that RE2 \pN keeps) ∪ the \s
        // set [\t\n\f\r ] verbatim. NOTE on \v (0x0B): upstream RE2
        // added \v to Perl \s in 2017, but the DuckDB build used as
        // the oracle does NOT include it — probed directly
        // (regexp_replace(chr(11), '[^\pL\pN\s]', ' ', 'g') → ' '),
        // so BOTH sides space \v out and the agreement is pinned by a
        // \v decoration in lux_q14_fold_diff; if a future oracle's \s
        // gains \v, the differential fires rather than drifting
        // silently (round-13 advice, resolved by measurement).
        // Everything else — punctuation AND non-ASCII whitespace (RE2
        // \s is ASCII-only, so the oracle turns an em space into ' ';
        // keeping it verbatim here would survive the Java \s+ of
        // neither tokensCol nor the phrase regex identically) —
        // becomes one ASCII space.
        val keep = Character.isLetter(cp) || Character.isDigit(cp) ||
          t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER ||
          cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r'
        // Greek FINAL sigma folds to medial sigma: JVM/Spark lowercase
        // with full casing ('ΑΣ' → 'ας') while DuckDB's lower uses the
        // simple mapping ('ασ') — folding ς → σ on both sides (the
        // replace pass in foldSql) makes the derivations meet, and is
        // what ICU case-insensitive comparison does anyway
        if (cp == 0x03C2) b.appendCodePoint(0x03C3)
        else if (keep) b.appendCodePoint(cp)
        else b.append(' ') // token break (see scaladoc)
      }
      i += Character.charCount(cp)
    }
    b.toString
  }

  /** Column wrapper over the native expression. */
  def foldCol(c: Column): Column = call_function("word_fold", c)

  /** Register as SQL function `word_fold` on a session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_fold", args => WordFoldExpr(args.head), "built-in")

  /** The oracle-side twin of [[fold]]: marks vanish, punctuation
    * becomes a space (token break), Greek final sigma folds medial
    * (see the sigma note in [[fold]] — DuckDB's simple-cased 'ασ' and
    * the JVM's full-cased 'ας' meet at 'ασ'). */
  def foldSql(x: String): String =
    s"regexp_replace(regexp_replace(replace(strip_accents($x), 'ς', 'σ')," +
      " '\\pM', '', 'g'), '[^\\pL\\pN\\s]', ' ', 'g')"
}

/** Native codegen'd expression: one static call per row. */
final case class WordFoldExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_fold requires STRING input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      WordFold.fold(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.WordFold.fold($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): WordFoldExpr =
    copy(child = newChild)
}
