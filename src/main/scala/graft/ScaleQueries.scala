package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-technique operators: explicit skew-salted two-phase aggregation
  * (SURVEY §4.3 — hot AAT terms / idmap heavy hitters) and URL
  * normalization + webpage dedupe (F9/M13,
  * `pipeline/sources/lux/final/mapper.py:713-776`). */
object ScaleQueries extends QueryGroup {

  /** Two-phase salted aggregation: counts per partkey where phase 1
    * aggregates (key, salt) partials and phase 2 merges — the skew
    * pattern for heavy-hitter keys. Result must equal the direct
    * groupBy (the oracle is the unsalted form). */
  def saltedRefCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .withColumn("salt", pmod($"l_orderkey", lit(16)))
    val partial = li.groupBy($"l_partkey", $"salt")
      .agg(count(lit(1)).as("pn"),
        sum(round($"l_quantity").cast("long")).as("pq"))
    partial.groupBy($"l_partkey")
      .agg(sum($"pn").cast("long").as("n_refs"),
        sum($"pq").cast("long").as("sum_qty"))
  }
  private val saltedRefCountOracle: String =
    """SELECT l_partkey, COUNT(*) AS n_refs,
      |  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY l_partkey""".stripMargin

  /** F9: URL normalization + dedupe — synthesize per-doc URLs, normalize
    * (lowercase host, strip www., strip trailing slash, default scheme),
    * and dedupe docs by normalized URL (webpage dedupe shape). */
  def urlNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // deterministic raw URL variants from the synthetic corpus
    val raw = when($"doc_id" % 3 === 0,
        concat(lit("HTTP://WWW."), $"source", lit(".example.com/docs/")))
      .when($"doc_id" % 3 === 1,
        concat(lit("http://"), $"source", lit(".example.com/docs")))
      .otherwise(concat(lit("//www."), $"source", lit(".Example.com/docs")))
    val withUrl = Tables.load(spark, dir, "documents")
      .select($"doc_id", lower(raw).as("lowered"))
    val normalized = regexp_replace(
      regexp_replace(
        regexp_replace($"lowered", "^(http://|//)", ""),
        "^www\\.", ""),
      "/$", "")
    withUrl.select($"doc_id", normalized.as("url"))
      .groupBy($"url")
      .agg(min($"doc_id").as("canonical_doc"), count(lit(1)).as("n_pages"))
  }
  private val urlNormalizeOracle: String =
    """WITH raw AS (
      |  SELECT doc_id, lower(CASE
      |    WHEN doc_id % 3 = 0 THEN 'HTTP://WWW.' || source || '.example.com/docs/'
      |    WHEN doc_id % 3 = 1 THEN 'http://' || source || '.example.com/docs'
      |    ELSE '//www.' || source || '.Example.com/docs' END) AS lowered
      |  FROM documents)
      |SELECT regexp_replace(regexp_replace(regexp_replace(lowered,
      |    '^(http://|//)', ''), '^www\.', ''), '/$', '') AS url,
      |  MIN(doc_id) AS canonical_doc, COUNT(*) AS n_pages
      |FROM raw GROUP BY 1""".stripMargin

  /** Token-balanced output sharding: rank documents by token count
    * (desc, doc_id tiebreak) and deal them round-robin over K shards —
    * the longest-processing-time heuristic that keeps training shards
    * within one max-document of each other in token mass. The global
    * rank comes from operators.GlobalRank (range-partition + partition
    * offsets), NOT an unpartitioned row_number window, so the plan has
    * no single-partition stage at 100 TB. */
  def shardBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val K = 8L
    val d = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        size(TextQueries.tokensCol($"text")).cast("long").as("n_tokens"))
    operators.GlobalRank.withRank(d, "rk", $"n_tokens".desc, $"doc_id".asc)
      .select($"doc_id", $"n_tokens", pmod($"rk" - 1L, lit(K)).as("shard"))
  }
  private val shardBalanceOracle: String = {
    val t = TextQueries.tokensSql("text")
    s"""WITH d AS (
       |  SELECT doc_id, CAST(len($t) AS BIGINT) AS n_tokens FROM documents)
       |SELECT doc_id, n_tokens,
       |  CAST((ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) - 1) % 8
       |    AS BIGINT) AS shard
       |FROM d""".stripMargin
  }

  /** Salted shuffle JOIN for a pathological head key — the join-side
    * counterpart of a8's salted aggregation. The fact side carries a
    * salt derived from an unrelated uniform column (l_orderkey), the
    * dim side is replicated R ways with explode, and the equi-join
    * runs on (key, salt) so ONE hot key spreads over R reducers.
    * AQE's skew-join split handles moderate skew on its own; explicit
    * salting is the shape for a head key too big for any single
    * reducer (idmap heavy hitters, SURVEY §4.3). The dim side is
    * hinted SHUFFLE_HASH so the salted co-location is actually
    * exercised (auto-broadcast would short-circuit the demo; with a
    * broadcast join salting is unnecessary in the first place).
    * Result must equal the plain unsalted join — the oracle. */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val R = 8
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_partkey", $"l_extendedprice",
        pmod($"l_orderkey", lit(R)).as("salt"))
    val p = Tables.load(spark, dir, "part")
      .select($"p_partkey", $"p_brand",
        explode(array((0 until R).map(lit): _*)).as("salt"))
    li.join(p.hint("SHUFFLE_HASH"),
        li("l_partkey") === p("p_partkey") && li("salt") === p("salt"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"),
        sum(round($"l_extendedprice" * 100).cast("long")).as("cents"))
  }
  private val saltedJoinOracle: String =
    """SELECT p_brand, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1""".stripMargin

  /** Z-order layout audit: morton-interleave (l_partkey, l_orderkey)
    * over an 8-bit folded domain, group rows by the top-4-bit morton
    * prefix (16 buckets = 4×4 grid cells), and report each bucket's
    * bounding box. The property that makes the layout worth writing:
    * every prefix bucket bounds BOTH dimensions (box ≤ 64×64 here), so
    * a file written per bucket is prunable by min/max footers on
    * either key — see functions.ZOrder. The fold (% 256) keeps the
    * demo scale-invariant across SFs. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .select(($"l_partkey" % 256).cast("long").as("pk"),
        ($"l_orderkey" % 256).cast("long").as("sk"))
    li.withColumn("bucket",
        shiftright(functions.ZOrder.mortonCol($"pk", $"sk", 8), 12))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        min($"pk").as("pk_lo"), max($"pk").as("pk_hi"),
        min($"sk").as("sk_lo"), max($"sk").as("sk_hi"))
  }
  private val zorderLayoutOracle: String = {
    val m = functions.ZOrder.mortonSql("pk", "sk", 8)
    s"""WITH k AS (
       |  SELECT CAST(l_partkey % 256 AS BIGINT) AS pk,
       |         CAST(l_orderkey % 256 AS BIGINT) AS sk
       |  FROM lineitem)
       |SELECT ($m) >> 12 AS bucket, COUNT(*) AS n,
       |  MIN(pk) AS pk_lo, MAX(pk) AS pk_hi,
       |  MIN(sk) AS sk_lo, MAX(sk) AS sk_hi
       |FROM k GROUP BY 1""".stripMargin
  }

  /** S14: table statistics in ONE scan — min/max/exact NDV for three
    * key columns of lineitem, unpivoted to (column, min_v, max_v, ndv)
    * rows: what ANALYZE TABLE collects for the optimizer, computed as
    * a single aggregation pass (Catalyst expands the multiple exact
    * count-distincts; at 100 TB swap them for approx_count_distinct
    * and keep the one-scan shape). */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .agg(
        min($"l_partkey").cast("long").as("pk_min"),
        max($"l_partkey").cast("long").as("pk_max"),
        countDistinct($"l_partkey").as("pk_ndv"),
        min($"l_suppkey").cast("long").as("sk_min"),
        max($"l_suppkey").cast("long").as("sk_max"),
        countDistinct($"l_suppkey").as("sk_ndv"),
        min($"l_orderkey").cast("long").as("ok_min"),
        max($"l_orderkey").cast("long").as("ok_max"),
        countDistinct($"l_orderkey").as("ok_ndv"))
      .select(expr(
        """stack(3,
          |  'l_partkey', pk_min, pk_max, pk_ndv,
          |  'l_suppkey', sk_min, sk_max, sk_ndv,
          |  'l_orderkey', ok_min, ok_max, ok_ndv)
          |  AS (col_name, min_v, max_v, ndv)""".stripMargin))
  }
  private val tableStatsOracle: String =
    """SELECT 'l_partkey' AS col_name, MIN(l_partkey) AS min_v,
      |  MAX(l_partkey) AS max_v, COUNT(DISTINCT l_partkey) AS ndv
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_suppkey', MIN(l_suppkey), MAX(l_suppkey),
      |  COUNT(DISTINCT l_suppkey) FROM lineitem
      |UNION ALL
      |SELECT 'l_orderkey', MIN(l_orderkey), MAX(l_orderkey),
      |  COUNT(DISTINCT l_orderkey) FROM lineitem""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("s14_table_stats", tableStats, Some(tableStatsOracle)))
    Queries.register(QueryDef("s13_zorder_layout", zorderLayout, Some(zorderLayoutOracle)))
    Queries.register(QueryDef("a8_salted_refcount", saltedRefCount, Some(saltedRefCountOracle)))
    Queries.register(QueryDef("f9_url_normalize", urlNormalize, Some(urlNormalizeOracle)))
    Queries.register(QueryDef("t_shard_balance", shardBalance, Some(shardBalanceOracle)))
    Queries.register(QueryDef("j16_salted_join", saltedJoin, Some(saltedJoinOracle)))
  }
}
