package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (language-ID heuristic, quality scoring, token counting,
  * rolling-hash fingerprinting; reference analogs: recordText aggregation
  * `pipeline/sources/lux/qlever/mapper.py:412-463`, keyword stats
  * `pipeline/storage/marklogic/ml_lexer.py:65-86`).
  *
  * Design for 100 TB: every op here is a narrow map-only projection built
  * from codegen'd higher-order functions (split/filter/transform/aggregate)
  * — no shuffle, no UDF, no driver state; it scales linearly with input
  * splits. Hashes are polynomial char-code folds mod 2^31-1, chosen so the
  * DuckDB oracle can reproduce them bit-for-bit with list_reduce.
  */
object TextQueries extends QueryGroup {

  val HashP = 2147483647L // 2^31-1, keeps acc*131+c within int64
  val WordB = 31L
  val DocB = 131L

  /** Positive-operand integer division matching DuckDB `//` (floor). */
  def intDiv(a: Column, b: Column): Column = floor(a / b).cast("long")

  /** Whitespace tokens with empties dropped (both engines keep boundary
    * empties differently; filtering makes them agree). */
  def tokensCol(text: Column): Column = filter(split(text, "\\s+"), _ =!= "")
  def tokensSql(text: String): String =
    s"list_filter(string_split_regex($text, '\\s+'), x -> x <> '')"

  /** Polynomial hash of one word's bytes: fold (a*31+b) % (2^31-1).
    * Backed by the native codegen'd PolyHash expression; identical to the
    * HOF char-fold (wordHashHof) for ASCII input. */
  def wordHash(w: Column): Column = call_function("poly_hash", w)

  /** Reference HOF implementation (kept for the equivalence spec). */
  def wordHashHof(w: Column): Column =
    aggregate(transform(split(w, ""), c => ascii(c).cast("long")),
      lit(0L), (a, c) => (a * WordB + c) % HashP)
  def wordHashSql(w: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(unicode(($w)[i]) AS BIGINT) for i in range(1, len($w)+1)]), (a,b) -> (a*$WordB+b) % $HashP)"

  /** Doc fingerprint: order-sensitive fold of word hashes (rolling hash). */
  def docFingerprint(tokens: Column): Column =
    aggregate(transform(tokens, wordHash(_)), lit(0L),
      (a, b) => (a * DocB + b) % HashP)
  def docFingerprintSql(tokens: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($tokens, w -> ${wordHashSql("w")})), (a,b) -> (a*$DocB+b) % $HashP)"

  /** Language marker lexicons (heuristic language-ID over the synthetic
    * corpus vocabulary; the real-world analog is char-n-gram profiles). */
  val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("order", "sort", "merge", "window"),
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "value", "row", "column"),
    "fr" -> Seq("join", "filter", "scan", "hash"),
    "zh" -> Seq("spark", "stream", "batch", "query"))

  val stopwords: Seq[String] = Seq("the", "a")

  // ---------------------------------------------------------------- queries

  /** Token counting: whitespace tokenization + distinct + length stats.
    * Integer-exact: avg length quantized by integer division. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokensCol($"text")
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        intDiv(aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _)
          * 1000L, size(toks)).as("avg_len_milli"))
  }
  private val tokenCountOracle: String = {
    val t = tokensSql("text")
    s"""SELECT doc_id,
       |  CAST(len($t) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct($t)) AS BIGINT) AS n_distinct,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($t, x -> CAST(len(x) AS BIGINT))), (a,b) -> a+b) * 1000 // CAST(len($t) AS BIGINT) AS avg_len_milli
       |FROM documents""".stripMargin
  }

  /** Language-ID: argmax of marker-lexicon hit counts, tie-broken by lang
    * ascending; docs with zero hits → 'und'. Shuffle-free columnar argmax
    * (sorted struct array), so it stays inside whole-stage codegen. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokensCol($"text")
    val scored = markers.map { case (lang, words) =>
      struct((-size(filter(toks, t => t.isInCollection(words)))).cast("long").as("neg"),
        lit(lang).as("lang"))
    }
    val best = element_at(sort_array(array(scored: _*)), 1)
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang".as("actual_lang"),
        when(best.getField("neg") === 0, "und")
          .otherwise(best.getField("lang")).as("pred_lang"),
        (-best.getField("neg")).as("score"))
  }
  private val langIdOracle: String = {
    val t = tokensSql("text")
    val scores = markers.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ",", "]")
      s"SELECT doc_id, '$lang' AS l, CAST(len(list_filter($t, x -> list_contains($lst, x))) AS BIGINT) AS s FROM documents"
    }.mkString("\nUNION ALL\n")
    s"""WITH scores AS ($scores),
       |best AS (
       |  SELECT doc_id, l, s,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, l ASC) AS rn
       |  FROM scores)
       |SELECT d.doc_id, d.lang AS actual_lang,
       |  CASE WHEN b.s = 0 THEN 'und' ELSE b.l END AS pred_lang, b.s AS score
       |FROM documents d JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1""".stripMargin
  }

  /** Quality scoring: token/distinct/stopword ratios, all integer-exact
    * (milli units via integer division); boolean keep-flag like a filter
    * stage in a training-data pipeline. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokensCol($"text")
    val n = size(toks).cast("long")
    val nDist = size(array_distinct(toks)).cast("long")
    val nStop = size(filter(toks, t => t.isInCollection(stopwords))).cast("long")
    Tables.load(spark, dir, "documents")
      .select($"doc_id", n.as("n_tokens"),
        intDiv(nDist * 1000L, n).as("distinct_milli"),
        intDiv(nStop * 1000L, n).as("stop_milli"),
        intDiv($"n_chars", n).as("chars_per_token"),
        (n >= 10L && intDiv(nDist * 1000L, n) >= 100L &&
          intDiv(nStop * 1000L, n) <= 500L).as("keep"))
  }
  private val qualityOracle: String = {
    val t = tokensSql("text")
    val stop = stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH m AS (
       |  SELECT doc_id, n_chars,
       |    CAST(len($t) AS BIGINT) AS n,
       |    CAST(len(list_distinct($t)) AS BIGINT) AS nd,
       |    CAST(len(list_filter($t, x -> list_contains($stop, x))) AS BIGINT) AS ns
       |  FROM documents)
       |SELECT doc_id, n AS n_tokens,
       |  nd * 1000 // n AS distinct_milli,
       |  ns * 1000 // n AS stop_milli,
       |  n_chars // n AS chars_per_token,
       |  (n >= 10 AND nd * 1000 // n >= 100 AND ns * 1000 // n <= 500) AS keep
       |FROM m""".stripMargin
  }

  /** Document fingerprinting: order-sensitive rolling hash over the token
    * stream — groups byte-identical token sequences (exact-dup substrate). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", docFingerprint(tokensCol($"text")).as("fp"))
  }
  private val fingerprintOracle: String =
    s"""SELECT doc_id, ${docFingerprintSql(tokensSql("text"))} AS fp
       |FROM documents""".stripMargin

  /** Dataset profiling (SURVEY §7.1 step 11): per-table cardinality and
    * null stats with approx_count_distinct (HLL++). Sketches differ
    * across engines, so this registers WITHOUT an oracle — the driver
    * records the weaker rows-only check; exact columns ride along. */
  def profile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.load(spark, dir, "documents")
    d.select(
      count(lit(1)).as("n_rows"),
      approx_count_distinct($"text").as("approx_texts"),
      approx_count_distinct($"lang").as("approx_langs"),
      countDistinct($"source").as("exact_sources"),
      sum(when($"text".isNull, 1L).otherwise(0L)).as("null_texts"))
  }

  /** The oracle-checked companion of t_profile: the same profiling
    * shape with EXACT distincts (count_distinct is engine-portable;
    * the HLL++ variant above stays for the scale path where exact
    * distinct would shuffle the full column). */
  def profileExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.load(spark, dir, "documents")
    d.groupBy($"source")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"text").as("n_texts"),
        countDistinct($"lang").as("n_langs"),
        sum(when($"text".isNull, 1L).otherwise(0L)).as("null_texts"),
        sum(length($"text")).cast("long").as("total_chars"))
  }
  private val profileExactOracle: String =
    """SELECT source, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT text) AS n_texts,
      |  COUNT(DISTINCT lang) AS n_langs,
      |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_texts,
      |  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
      |FROM documents GROUP BY source""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("t_profile", profile, None))
    Queries.register(QueryDef("t_profile_exact", profileExact, Some(profileExactOracle)))
    Queries.register(QueryDef("t_token_count", tokenCount, Some(tokenCountOracle)))
    Queries.register(QueryDef("t_lang_id", langId, Some(langIdOracle)))
    Queries.register(QueryDef("t_quality_score", qualityScore, Some(qualityOracle)))
    Queries.register(QueryDef("t_fingerprint", fingerprint, Some(fingerprintOracle)))
  }
}
