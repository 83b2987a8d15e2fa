package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents`/`embeddings` — the core
  * training-data-pipeline surface (generalizes the reference's identity
  * resolution: name/URI reconciliation `pipeline/process/base/reconciler.py`
  * is exact-key dedup; MinHash-LSH is its fuzzy analog at corpus scale).
  *
  * Scale design: every signature (fingerprint, minhash vector, simhash) is
  * computed map-side per row with codegen'd higher-order functions — no
  * shuffle until the LSH band join, which shuffles only (band_idx, hash,
  * doc_id) tuples, never documents. Candidate verification joins back the
  * (small) shingle-id arrays by doc_id. At 100 TB the band join is the only
  * wide stage and is uniformly hash-partitioned; hot bands (skew) would be
  * handled by salting the band key.
  *
  * Hash arithmetic is mod 2^31-1 polynomial folding so the DuckDB oracle
  * reproduces results bit-for-bit (validated).
  */
object DedupQueries extends QueryGroup {
  import TextQueries.{HashP => P, tokensCol, tokensSql, wordHash, intDiv,
    docFingerprint, docFingerprintSql}

  /** Deterministic per-permutation constants for minhash/simhash. */
  val K = 16
  val SimK = 32
  def aj(j: Int): Long = (2L * j + 3) * 104729L % P
  def bj(j: Int): Long = (j + 1L) * 179426549L % P

  // ------------------------------------------------------------ helpers

  /** Distinct word-3-gram shingle ids from a PRE-PROJECTED token-hash
    * column `h`: combine neighbor hashes arithmetically.
    *
    * `h` MUST be a materialized column reference, never an inline
    * expression: Spark re-evaluates non-attribute subtrees referenced
    * inside a higher-order-function lambda once PER ELEMENT (no CSE
    * across lambda boundaries), turning O(tokens) into O(tokens^2) per
    * row — measured 150 s vs 1 s on 5k docs at sf0.1. */
  private def shingleIdsFrom(h: Column): Column =
    when(size(h) >= 3,
      array_distinct(transform(sequence(lit(1), size(h) - 2), i =>
        ((element_at(h, i) * 131L + element_at(h, i + 1)) % P * 131L +
          element_at(h, i + 2)) % P)))
      .otherwise(array().cast("array<long>"))

  private def shingleIdsSql: String = {
    val wh = s"list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(unicode(w[k]) AS BIGINT) for k in range(1, len(w)+1)]), (a,b) -> (a*31+b) % $P)"
    s"""CASE WHEN len(t) >= 3 THEN list_distinct([
       |      ((h[i]*131 + h[i+1]) % $P * 131 + h[i+2]) % $P
       |      for i in range(1, len(t)-1) ])
       |    ELSE CAST([] AS BIGINT[]) END""".stripMargin
  }
  /** SQL prelude computing per-token hashes `h` from tokens `t`. */
  private def tokenHashesSql: String = {
    val wh = s"list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(unicode(w[k]) AS BIGINT) for k in range(1, len(w)+1)]), (a,b) -> (a*31+b) % $P)"
    s"list_transform(t, w -> $wh)"
  }

  // ------------------------------------------------------------ queries

  /** Exact dedup: hash-groupBy on an order-insensitive content signature
    * (rolling hash of the sorted token stream). The distributed exact-dup
    * primitive: one shuffle on a 8-byte key regardless of document size. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        docFingerprint(array_sort(tokensCol($"text"))).as("content_key"))
      .groupBy($"content_key")
      .agg(min($"doc_id").as("canonical_doc"), count(lit(1)).as("n_docs"))
  }
  private val exactDedupOracle: String = {
    val t = tokensSql("text")
    s"""SELECT ${docFingerprintSql(s"list_sort($t)")} AS content_key,
       |  MIN(doc_id) AS canonical_doc, COUNT(*) AS n_docs
       |FROM documents GROUP BY 1""".stripMargin
  }

  /** MinHash + LSH near-dup: per-doc 16-permutation minhash signature
    * (map-side), 8 bands x 2 rows -> band-bucket join for candidates,
    * exact Jaccard verification, keep pairs >= 0.8. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // persist BEFORE filtering: predicate pushdown would substitute the
    // alias chain into the filter and re-trigger the per-element
    // re-evaluation documented on shingleIdsFrom. The cache also serves
    // the band join (x2) and both verify joins.
    val sidTbl = Tables.load(spark, dir, "documents")
      .select($"doc_id", transform(tokensCol($"text"), wordHash(_)).as("h"))
      .select($"doc_id", shingleIdsFrom($"h").as("sid"))
      .persist()
    val base = sidTbl.filter(size($"sid") > 0)
    val sigs = base.select($"doc_id" +: $"sid" +:
      (0 until K).map(j => array_min(transform($"sid",
        s => (lit(aj(j)) * s + lit(bj(j))) % P)).as(s"m$j")): _*)
    val bandCols = (0 until K / 2).map(b =>
      struct(lit(b).as("band_idx"),
        (($"m${2 * b}" * 131L + $"m${2 * b + 1}") % P).as("band_hash")))
    val bandRows = sigs
      .select($"doc_id", explode(array(bandCols: _*)).as("band"))
      .select($"doc_id", $"band.band_idx", $"band.band_hash")
    val cand = bandRows.as("a").join(bandRows.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
      // Materialization barrier: candidate pairs are tiny relative to the
      // corpus; fusing signature generation + band join + verify into one
      // whole-stage-codegen tree makes Catalyst inline the minhash
      // expression forest into every downstream operator (measured 126 s
      // vs 2 s at sf0.1). Real LSH pipelines persist the candidate table
      // at this point anyway.
      .localCheckpoint()
    cand
      .join(base.select($"doc_id".as("doc_a"), $"sid".as("sid_a")), "doc_a")
      .join(base.select($"doc_id".as("doc_b"), $"sid".as("sid_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        intDiv(size(array_intersect($"sid_a", $"sid_b")).cast("long") * 1000L,
          size(array_union($"sid_a", $"sid_b")).cast("long")).as("jacc_milli"))
      .filter($"jacc_milli" >= 800L)
  }
  private val minhashOracle: String = {
    val mh = (0 until K).map(j =>
      s"list_min(list_transform(sid, s -> (${aj(j)}*s + ${bj(j)}) % $P)) AS m$j").mkString(",\n  ")
    val bands = (0 until K / 2).map(b =>
      s"((m${2 * b}*131 + m${2 * b + 1}) % $P) AS band$b").mkString(", ")
    val bandRows = (0 until K / 2).map(b =>
      s"SELECT doc_id, $b AS band_idx, band$b AS band_hash FROM bandsig").mkString("\nUNION ALL\n")
    s"""WITH toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
       |th AS (SELECT doc_id, t, $tokenHashesSql AS h FROM toks),
       |shing AS (SELECT doc_id, $shingleIdsSql AS sid FROM th),
       |base AS (SELECT doc_id, sid FROM shing WHERE len(sid) > 0),
       |sigs AS (SELECT doc_id, $mh FROM base),
       |bandsig AS (SELECT doc_id, $bands FROM sigs),
       |bandrows AS ($bandRows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bandrows a JOIN bandrows b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(sa.sid, sb.sid)) AS BIGINT) * 1000
       |    // CAST(len(list_distinct(list_concat(sa.sid, sb.sid))) AS BIGINT) AS jacc_milli
       |FROM cand
       |JOIN base sa ON sa.doc_id = doc_a
       |JOIN base sb ON sb.doc_id = doc_b
       |WHERE CAST(len(list_intersect(sa.sid, sb.sid)) AS BIGINT) * 1000
       |    // CAST(len(list_distinct(list_concat(sa.sid, sb.sid))) AS BIGINT) >= 800""".stripMargin
  }

  /** SimHash: 32-bit tf-weighted fingerprint per doc (map-side), byte-band
    * blocking join, near-partner count at hamming <= 2. Compact per-doc
    * output (pairs stay internal — the corpus is dense in near-dups). */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.load(spark, dir, "documents")
      .select($"doc_id", transform(tokensCol($"text"), wordHash(_)).as("ids"))
      .filter(size($"ids") > 0)
    val votes = (0 until SimK).map(j =>
      aggregate($"ids", lit(0L),
        (acc, x) => acc + ((lit(aj(j)) * x + lit(bj(j))) % P) % 2L * 2L - 1L).as(s"v$j"))
    val fpCol = (0 until SimK).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val fps = ids.select($"doc_id" +: votes: _*)
      .select($"doc_id", fpCol.as("fp"))
    val bandCols = (0 until 4).map(b =>
      struct(lit(b).as("band_idx"),
        shiftright($"fp", 8 * b).bitwiseAND(255L).as("band_hash")))
    val bandRows = fps.select($"doc_id", $"fp", explode(array(bandCols: _*)).as("band"))
      .select($"doc_id", $"fp", $"band.band_idx", $"band.band_hash")
    val pairs = bandRows.as("a").join(bandRows.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" =!= $"b.doc_id")
      .select($"a.doc_id".as("doc_id"), $"b.doc_id".as("partner"),
        bit_count($"a.fp".bitwiseXOR($"b.fp")).as("ham"))
      .distinct()
    val near = pairs.filter($"ham" <= 2)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_near"))
    fps.join(near, Seq("doc_id"), "left")
      .select($"doc_id", $"fp", coalesce($"n_near", lit(0L)).as("n_near"))
  }
  private val simhashOracle: String = {
    val whash = s"list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(unicode(w[k]) AS BIGINT) for k in range(1, len(w)+1)]), (a,b) -> (a*31+b) % $P)"
    val votes = (0 until SimK).map(j =>
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ids, x -> ((${aj(j)}*x+${bj(j)}) % $P) % 2 * 2 - 1)), (a,b)->a+b) AS v$j").mkString(",\n  ")
    val fp = (0 until SimK).map(j => s"(CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, fp, $b AS band_idx, (fp >> ${8 * b}) & 255 AS band_hash FROM fps").mkString("\nUNION ALL\n")
    s"""WITH ids AS (
       |  SELECT doc_id, list_transform(${tokensSql("text")}, w -> $whash) AS ids
       |  FROM documents),
       |sv AS (SELECT doc_id, $votes FROM ids WHERE len(ids) > 0),
       |fps AS (SELECT doc_id, CAST($fp AS BIGINT) AS fp FROM sv),
       |bandrows AS ($bandRows),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS partner,
       |    bit_count(xor(a.fp, b.fp)) AS ham
       |  FROM bandrows a JOIN bandrows b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |   AND a.doc_id <> b.doc_id),
       |near AS (SELECT doc_id, COUNT(*) AS n_near FROM pairs WHERE ham <= 2 GROUP BY doc_id)
       |SELECT f.doc_id, f.fp, COALESCE(n.n_near, 0) AS n_near
       |FROM fps f LEFT JOIN near n ON f.doc_id = n.doc_id""".stripMargin
  }

  /** N-gram (word-bigram) Jaccard near-dup with length-bucket blocking:
    * all-pairs only inside a block — the classic blocked pairwise dedup.
    * At scale the block key bounds the quadratic term. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // two-step projection: h must be an attribute before the gram lambda
    // references it (see shingleIdsFrom scaling note)
    val bigramIds = when(size($"h") >= 2,
      array_distinct(transform(sequence(lit(1), size($"h") - 1), i =>
        (element_at($"h", i) * 131L + element_at($"h", i + 1)) % P)))
      .otherwise(array().cast("array<long>"))
    val base = Tables.load(spark, dir, "documents")
      .select($"doc_id", transform(tokensCol($"text"), wordHash(_)).as("h"))
      .select($"doc_id", bigramIds.as("sid"),
        intDiv(size($"h").cast("long"), lit(32L)).as("blk"))
      .persist() // barrier before filter (see minhashLsh) + both join sides
      .filter(size($"sid") > 0)
    base.as("a").join(base.as("b"),
        $"a.blk" === $"b.blk" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        intDiv(size(array_intersect($"a.sid", $"b.sid")).cast("long") * 1000L,
          size(array_union($"a.sid", $"b.sid")).cast("long")).as("jacc_milli"))
      .filter($"jacc_milli" >= 500L)
  }
  private val ngramJaccardOracle: String =
    s"""WITH toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
       |th AS (SELECT doc_id, t, $tokenHashesSql AS h FROM toks),
       |base AS (
       |  SELECT doc_id,
       |    CASE WHEN len(t) >= 2 THEN list_distinct([ (h[i]*131 + h[i+1]) % $P for i in range(1, len(t)) ])
       |         ELSE CAST([] AS BIGINT[]) END AS sid,
       |    CAST(len(t) AS BIGINT) // 32 AS blk
       |  FROM th),
       |nz AS (SELECT * FROM base WHERE len(sid) > 0)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(len(list_intersect(a.sid, b.sid)) AS BIGINT) * 1000
       |    // CAST(len(list_distinct(list_concat(a.sid, b.sid))) AS BIGINT) AS jacc_milli
       |FROM nz a JOIN nz b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |WHERE CAST(len(list_intersect(a.sid, b.sid)) AS BIGINT) * 1000
       |    // CAST(len(list_distinct(list_concat(a.sid, b.sid))) AS BIGINT) >= 500""".stripMargin

  /** Embedding cosine near-dup, blocked by label (the coarse-quantizer
    * cell): exact integer dot products over milli-quantized vectors, then
    * one correctly-rounded IEEE sqrt+divide — bit-stable across engines. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"label",
        transform($"embedding", x => round(x.cast("double") * 1000d).cast("long")).as("q"))
      .withColumn("n2", aggregate(zip_with($"q", $"q", _ * _), lit(0L), _ + _))
    base.as("a").join(base.as("b"),
        $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        floor(lit(1000d) *
          aggregate(zip_with($"a.q", $"b.q", _ * _), lit(0L), _ + _).cast("double") /
          sqrt($"a.n2".cast("double") * $"b.n2".cast("double"))).cast("long")
          .as("cos_milli"))
      .filter($"cos_milli" >= 300L)
  }
  private val embeddingNearDupOracle: String =
    s"""WITH base AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
       |  FROM embeddings),
       |n AS (SELECT vec_id, label, q,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), [q[i]*q[i] for i in range(1, len(q)+1)]), (a,b)->a+b) AS n2
       |  FROM base)
       |SELECT vec_a, vec_b, cos_milli FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    CAST(floor(1000.0 *
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), [a.q[i]*b.q[i] for i in range(1, len(a.q)+1)]), (x,y)->x+y)
       |      / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE))) AS BIGINT) AS cos_milli
       |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
       |WHERE cos_milli >= 300""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("d1_exact_dedup", exactDedup, Some(exactDedupOracle)))
    Queries.register(QueryDef("d2_minhash_lsh", minhashLsh, Some(minhashOracle), bench = true))
    Queries.register(QueryDef("d3_simhash", simhash, Some(simhashOracle)))
    Queries.register(QueryDef("d4_ngram_jaccard", ngramJaccard, Some(ngramJaccardOracle)))
    Queries.register(QueryDef("d5_embedding_neardup", embeddingNearDup, Some(embeddingNearDupOracle), bench = true))
  }
}
