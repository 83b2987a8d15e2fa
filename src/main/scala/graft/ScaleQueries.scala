package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** S19: the file-skipping evaluation s13 exists to justify — per-file
    * (bucket) min/max column stats under the Z-ORDERED layout vs the
    * naive single-key (orderkey-range) layout, probed with four pk
    * range predicates: a file is skippable when its [pk_lo, pk_hi]
    * stripe misses the probe range, which is exactly the parquet
    * row-group / Delta file-stats pruning rule. The linear layout's
    * stripes span the whole pk domain (skips nothing); Z-ordering
    * localizes BOTH keys, so the same stats skip real files — the
    * measured difference is the query's output. */
  def fileSkippingEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .select(($"l_partkey" % 256).cast("long").as("pk"),
        ($"l_orderkey" % 256).cast("long").as("sk"))
    def stats(bucketed: DataFrame, layout: String) = bucketed
      .groupBy($"bucket")
      .agg(min($"pk").as("pk_lo"), max($"pk").as("pk_hi"))
      .withColumn("layout", lit(layout))
    val z = stats(li.withColumn("bucket",
      shiftright(functions.ZOrder.mortonCol($"pk", $"sk", 8), 12)), "zorder")
    val lin = stats(li.withColumn("bucket", shiftright($"sk", 4)), "linear")
    val probes = Seq((0L, 0L, 31L), (1L, 64L, 95L), (2L, 128L, 191L),
      (3L, 240L, 255L)).toDF("probe", "lo", "hi")
    z.union(lin).crossJoin(broadcast(probes))
      .groupBy($"layout", $"probe")
      .agg(count(lit(1)).as("n_files"),
        sum(when($"pk_hi" < $"lo" || $"pk_lo" > $"hi", 1L).otherwise(0L))
          .as("n_skipped"))
  }
  private val fileSkippingEvalOracle: String = {
    val m = functions.ZOrder.mortonSql("pk", "sk", 8)
    s"""WITH k AS (
       |  SELECT CAST(l_partkey % 256 AS BIGINT) AS pk,
       |         CAST(l_orderkey % 256 AS BIGINT) AS sk
       |  FROM lineitem),
       |z AS (
       |  SELECT 'zorder' AS layout, ($m) >> 12 AS bucket,
       |    MIN(pk) AS pk_lo, MAX(pk) AS pk_hi FROM k GROUP BY 2),
       |lin AS (
       |  SELECT 'linear' AS layout, sk >> 4 AS bucket,
       |    MIN(pk) AS pk_lo, MAX(pk) AS pk_hi FROM k GROUP BY 2),
       |f AS (SELECT * FROM z UNION ALL SELECT * FROM lin),
       |p AS (SELECT * FROM (VALUES (0, 0, 31), (1, 64, 95), (2, 128, 191),
       |  (3, 240, 255)) AS t(probe, lo, hi))
       |SELECT layout, CAST(probe AS BIGINT) AS probe,
       |  CAST(COUNT(*) AS BIGINT) AS n_files,
       |  CAST(COUNT(*) FILTER (pk_hi < lo OR pk_lo > hi) AS BIGINT)
       |    AS n_skipped
       |FROM f, p GROUP BY 1, 2""".stripMargin
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

  /** S15: bucketed co-located join — both sides written bucketed (and
    * sorted) by the join key, so the repeated fact⋈fact join runs with
    * NO exchange on either side: the layout pays the shuffle once at
    * write time and every subsequent join on that key is local. This
    * is the 100 TB answer to "the same big join every day" (idmap ⋈
    * records each build): at sf the bucket count is 8; on a cluster
    * it's sized so bucket ≈ one task's memory. The MERGE hint keeps
    * auto-broadcast from short-circuiting the demonstration (with a
    * broadcast join bucketing would be moot). PlanSpec pins the
    * exchange-free join. Oracle = the plain join. */
  /** One bucketed-layout fixture per (application, sf dir), written at
    * most once and reused by every subsequent invocation — the layout IS
    * the point (pay the shuffle at write time, join exchange-free
    * forever after), so rebuilding it per call was both wrong-shaped and
    * a shared-warehouse race: two concurrent sessions DROPping and
    * re-writing the same table names could collide. Table names carry a
    * per-JVM random suffix (cross-session isolation) and the write is
    * synchronized (in-session parallel invocations see one build). */
  private val bucketSuffix =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)
  private val bucketFixtures =
    scala.collection.mutable.Map.empty[(String, String), (String, String)]

  private def bucketTables(spark: SparkSession, dir: String): (String, String) =
    synchronized {
      import spark.implicits._
      // keyed per application so a fresh session (new catalog) rebuilds
      bucketFixtures.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
        val tag = s"${bucketSuffix}_${bucketFixtures.size}"
        val base = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_bucketed_$tag").getAbsolutePath
        val sides = Seq(
          (s"graft_b_orders_$tag",
            Tables.load(spark, dir, "orders").select($"o_orderkey", $"o_custkey"),
            "o_orderkey"),
          (s"graft_b_lineitem_$tag",
            Tables.load(spark, dir, "lineitem").select($"l_orderkey",
              round($"l_extendedprice" * 100).cast("long").as("price_cents")),
            "l_orderkey"))
        sides.foreach { case (name, df, key) =>
          df.write.format("parquet").option("path", s"$base/$name")
            .mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(name)
        }
        (sides(0)._1, sides(1)._1)
      })
    }

  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (ordersTable, lineitemTable) = bucketTables(spark, dir)
    val bl = spark.table(lineitemTable)
    val bo = spark.table(ordersTable)
    bl.hint("MERGE").join(bo, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_items"),
        sum($"price_cents").cast("long").as("rev_cents"))
  }
  private val bucketedJoinOracle: String =
    """SELECT o_custkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
      |    AS rev_cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** S16 compaction target size (bytes). Tiny at test sf so the plan is
    * non-trivial (~hundreds of output files); production uses 128-512 MB. */
  val CompactTarget = 16384L

  /** S16: small-file compaction plan — the one-record-per-object JSONL
    * layout (S1's dump world) read back as (id, bytes) and coalesced
    * into ~target-size output files by cumulative byte offset in id
    * order, preserving record order. The running sum comes from
    * operators.PrefixSum (range partition + per-partition totals), NOT
    * an unpartitioned window — at 100 TB the inventory itself is big.
    * Output: per planned file its record span and byte total — exactly
    * the manifest a compaction executor consumes. */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.load(spark, dir, "documents")
      .select($"doc_id", octet_length($"text").cast("long").as("bytes"))
    val summed = operators.PrefixSum.withRunningSum(
      d, "bytes", "cum_bytes", $"doc_id".asc)
    summed.select($"doc_id", $"bytes",
        TextQueries.intDiv($"cum_bytes" - $"bytes", lit(CompactTarget))
          .as("out_file"))
      .groupBy($"out_file")
      .agg(count(lit(1)).as("n_docs"),
        sum($"bytes").cast("long").as("file_bytes"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
  }
  private val compactionOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS bytes
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, bytes,
       |    CAST(SUM(bytes) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       |      - bytes AS BIGINT) AS prior
       |  FROM d)
       |SELECT prior // $CompactTarget AS out_file, COUNT(*) AS n_docs,
       |  CAST(SUM(bytes) AS BIGINT) AS file_bytes,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1""".stripMargin

  /** J18 sorted-neighborhood window width. */
  val SnmWindow = 5L

  /** J18: sorted-neighborhood blocking — the OTHER classic sub-quadratic
    * entity-resolution shape next to j17's deletion neighborhoods: sort
    * records by a blocking key (here the name), slide a fixed window of
    * w ranks, and compare only pairs within the window. Candidates are
    * n·w, never n²; the rank comes from operators.GlobalRank (no
    * single-partition window) and the window join is an equi-join on
    * rank after exploding each record to its w successor ranks. The
    * documented recall trade: a true match sorting > w ranks apart is
    * missed — mitigated in production by multi-pass SNM on a second key
    * (j17 IS that second pass here). Verification stays exact
    * (levenshtein ≤ 1). */
  def sortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.load(spark, dir, "customer")
      .select($"c_custkey".cast("long").as("k"), $"c_name".as("name"))
    val ranked = operators.GlobalRank.withRank(
      c, "rk", $"name".asc, $"k".asc)
    val probes = ranked.select($"k".as("a_key"), $"name".as("na"),
      explode(sequence($"rk" + 1L, $"rk" + SnmWindow)).as("rk"))
    probes.join(ranked.select($"rk", $"k".as("b_key"), $"name".as("nb")),
        "rk")
      .filter(levenshtein($"na", $"nb") <= 1)
      .select(least($"a_key", $"b_key").as("a_key"),
        greatest($"a_key", $"b_key").as("b_key"),
        levenshtein($"na", $"nb").cast("long").as("dist"))
  }
  private val snmOracle: String =
    s"""WITH c AS (
       |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name
       |  FROM customer),
       |r AS (
       |  SELECT k, name,
       |    ROW_NUMBER() OVER (ORDER BY name, k) AS rk
       |  FROM c)
       |SELECT LEAST(a.k, b.k) AS a_key, GREATEST(a.k, b.k) AS b_key,
       |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
       |FROM r a JOIN r b
       |  ON b.rk BETWEEN a.rk + 1 AND a.rk + $SnmWindow
       |WHERE levenshtein(a.name, b.name) <= 1""".stripMargin

  /** S21: join-size estimation from Count-Min sketches — the planner
    * probe that decides broadcast vs shuffle vs salt BEFORE running a
    * 100 TB join. Each side folds into a CmsD×CmsW counter grid (one
    * map-side pass, 1024 cells — table-size-independent); the estimate
    * is min over rows of the per-row inner product Σ_b L[b]·R[b]
    * (AMS/CMS join-size, Alon-Matias-Szegedy '96 / Cormode-Muthukrishnan
    * '05), which NEVER undercounts the true Σ_k l(k)·r(k) — collisions
    * only add mass — so acting on it is safe: a join the sketch calls
    * small IS small. Two probes: the key-unique orders⋈lineitem and the
    * 25-key customer⋈supplier nation blowup the estimator exists to
    * catch. exact_n is the evaluation ground truth, computed as
    * Σ_k cntL·cntR over per-key counts (never materializing the join).
    * Deterministic hash rows → the DuckDB replay is bit-exact. */
  def joinSizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // hash rows 64-67: clear of the token-CMS family (56-59) and the
    // HLL h2 row (60) — per-family index reservation keeps every
    // sketch's hash rows pairwise independent. The bucket/cells
    // definitions live in operators.JoinPlanner (the family's round-13
    // consumer) and are SHARED here so the engine arithmetic can never
    // drift from the oracle constants both splice.
    def cells(s: DataFrame) = operators.JoinPlanner.cells(s)
    def probe(name: String, left: DataFrame, right: DataFrame): DataFrame = {
      val est = cells(left).as("a").join(cells(right).as("b"), Seq("row", "bucket"))
        .groupBy($"row").agg(sum(col("a.n") * col("b.n")).as("ip"))
        .agg(min($"ip").as("cms_n"))
      val exact = left.groupBy($"k").agg(count(lit(1)).as("ln"))
        .join(right.groupBy($"k").agg(count(lit(1)).as("rn")), "k")
        .agg(coalesce(sum($"ln" * $"rn"), lit(0L)).as("exact_n"))
      exact.crossJoin(est).select(lit(name).as("join_name"),
        $"exact_n".cast("long").as("exact_n"), $"cms_n".cast("long").as("cms_n"))
    }
    val o = Tables.load(spark, dir, "orders").select($"o_orderkey".cast("long").as("k"))
    val li = Tables.load(spark, dir, "lineitem").select($"l_orderkey".cast("long").as("k"))
    val c = Tables.load(spark, dir, "customer").select($"c_nationkey".cast("long").as("k"))
    val s = Tables.load(spark, dir, "supplier").select($"s_nationkey".cast("long").as("k"))
    probe("orders_lineitem", o, li).union(probe("cust_supp_nation", c, s))
  }
  private val joinSizeEstimateOracle: String = {
    import TextQueries.{CmsD, CmsW, HashP}
    val consts = (0 until CmsD).map(j =>
      s"($j, ${functions.VecMath.aj(64 + j)}, ${functions.VecMath.bj(64 + j)})")
      .mkString(", ")
    def one(name: String, lsql: String, rsql: String): String =
      s"""SELECT '$name' AS join_name,
         |  (SELECT CAST(COALESCE(SUM(ln * rn), 0) AS BIGINT) FROM
         |    (SELECT k, COUNT(*) AS ln FROM ($lsql) GROUP BY k) a
         |    JOIN (SELECT k, COUNT(*) AS rn FROM ($rsql) GROUP BY k) b
         |    USING (k)) AS exact_n,
         |  (SELECT CAST(MIN(ip) AS BIGINT) FROM (
         |    SELECT l.j, SUM(l.n * r.n) AS ip
         |    FROM (SELECT j, ((a*(k % $HashP) + b) % $HashP) % $CmsW AS bucket,
         |            COUNT(*) AS n FROM ($lsql), consts GROUP BY 1, 2) l
         |    JOIN (SELECT j, ((a*(k % $HashP) + b) % $HashP) % $CmsW AS bucket,
         |            COUNT(*) AS n FROM ($rsql), consts GROUP BY 1, 2) r
         |      ON l.j = r.j AND l.bucket = r.bucket
         |    GROUP BY l.j)) AS cms_n""".stripMargin
    s"""WITH consts(j, a, b) AS (SELECT * FROM (VALUES $consts))
       |${one("orders_lineitem",
      "SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders",
      "SELECT CAST(l_orderkey AS BIGINT) AS k FROM lineitem")}
       |UNION ALL
       |${one("cust_supp_nation",
      "SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer",
      "SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier")}""".stripMargin
  }

  /** The one Config both plannedJoin and its oracle read — fixture-scaled
    * broadcast budget (dim(100) > budget ≥ nation(25) at every sf). */
  private val plannedJoinCfg =
    operators.JoinPlanner.Config(broadcastMaxRows = 64L)

  /** The s21 estimator CONSUMED: JoinPlanner sketches each pair, picks
    * broadcast / shuffle / salt, and EXECUTES the pick — one pair per
    * strategy branch, so the whole decision surface is registry-visible
    * (RegistryPlanAuditSpec audits the resulting physical plans):
    *   - uniform_li_part: fact⋈dim on a uniform dense key — dim exceeds
    *     the broadcast budget, no skew → SHUFFLE (hinted shuffle-hash);
    *   - small_dim_bcast: customer⋈nation — 25-row build side →
    *     BROADCAST;
    *   - hot_key_salt: 90% of probe rows on one key against a 100-row
    *     dim over the budget → SALT, r sized from the sketch bounds.
    * The oracle replays the DECISION bit-exactly (same CMS rows, same
    * integer thresholds — the j16b CASE arithmetic) AND the executed
    * join's aggregate, so a wrong strategy OR a wrong result fails the
    * hash. broadcastMaxRows=64 is the fixture-scaled deployment budget
    * (needs dim(100) > budget ≥ nation(25) at every sf; see
    * JoinPlanner.Config). Decisions are sf-stable by construction:
    * nation is always 25 rows, the hot dim always 100, and the
    * uniform pair's sketch share sits two orders from the 20%
    * threshold. */
  def plannedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import operators.JoinPlanner
    val cfg = plannedJoinCfg
    def pair(name: String, l: DataFrame, r: DataFrame): DataFrame = {
      val (j, s, e) = JoinPlanner.planJoin(l, r, cfg)
      j.agg(count(lit(1)).as("n_out"),
          coalesce(sum($"cents"), lit(0L)).as("cents_sum"))
        .select(lit(name).as("join_name"), lit(s.name).as("strategy"),
          lit(s.saltR.toLong).as("salt_r"), lit(e.nLeft).as("n_left"),
          lit(e.nRight).as("n_right"), lit(e.estRows).as("est_rows"),
          lit(e.hotOut).as("hot_out"), $"n_out", $"cents_sum")
    }
    val li = Tables.load(spark, dir, "lineitem")
    val cents = round($"l_extendedprice" * 100).cast("long").as("cents")
    val liPart = li.select($"l_partkey".cast("long").as("k"), cents)
    val part = Tables.load(spark, dir, "part")
      .select($"p_partkey".cast("long").as("k"))
    val cust = Tables.load(spark, dir, "customer")
      .select($"c_nationkey".cast("long").as("k"),
        round($"c_acctbal" * 100).cast("long").as("cents"))
    val nat = Tables.load(spark, dir, "nation")
      .select($"n_nationkey".cast("long").as("k"))
    // 90% of probe mass on key 0; the dim is the dense 0..99 key space
    // (p_partkey is dense from 1, so every residue exists at any sf)
    val hotLeft = li.select(
      when(pmod($"l_orderkey", lit(10)) < 9, lit(0L))
        .otherwise(pmod($"l_orderkey", lit(100)).cast("long")).as("k"), cents)
    val dim = Tables.load(spark, dir, "part")
      .groupBy(pmod($"p_partkey", lit(100)).cast("long").as("k"))
      .agg(count(lit(1)).as("dim_cnt")) // payload; unused by the probe agg
      .drop("dim_cnt")
    pair("uniform_li_part", liPart, part)
      .union(pair("small_dim_bcast", cust, nat))
      .union(pair("hot_key_salt", hotLeft, dim))
  }

  private val plannedJoinOracle: String = {
    import TextQueries.{CmsD, CmsW, HashP}
    val consts = (0 until CmsD).map(j =>
      s"($j, ${functions.VecMath.aj(64 + j)}, ${functions.VecMath.bj(64 + j)})")
      .mkString(", ")
    // the SAME Config instance the query passes to planJoin, its
    // constants spliced into the SQL — the decision thresholds cannot
    // drift between the engine and the oracle
    val (bMax, skew, p, maxS) = (plannedJoinCfg.broadcastMaxRows,
      plannedJoinCfg.skewShareMilli, plannedJoinCfg.saltTargetPartitions,
      plannedJoinCfg.maxSalt)
    // one pair: exact counts, CMS est/hot (the engine's exact
    // arithmetic), the decision CASE (JoinPlanner.choose, integer
    // milli-thresholds), and the executed join's aggregate
    def one(name: String, lsql: String, rsql: String): String =
      s"""SELECT '$name' AS join_name, strategy, salt_r, n_left, n_right,
         |  est_rows, hot_out,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ($lsql) l
         |     JOIN ($rsql) r USING (k)) AS n_out,
         |  (SELECT CAST(COALESCE(SUM(l.cents), 0) AS BIGINT) FROM ($lsql) l
         |     JOIN ($rsql) r USING (k)) AS cents_sum
         |FROM (
         |  SELECT n_left, n_right, est_rows, hot_out,
         |    CASE WHEN LEAST(n_left, n_right) <= $bMax THEN 'broadcast'
         |         WHEN est_rows > 0 AND hot_out * 1000 >= $skew * est_rows
         |           THEN 'salt'
         |         ELSE 'shuffle' END AS strategy,
         |    CASE WHEN LEAST(n_left, n_right) <= $bMax THEN 1
         |         WHEN est_rows > 0 AND hot_out * 1000 >= $skew * est_rows
         |           THEN GREATEST(2, LEAST($maxS,
         |             (hot_out * $p + est_rows - 1) // est_rows))
         |         ELSE 1 END AS salt_r
         |  FROM (
         |    SELECT
         |      (SELECT CAST(COUNT(*) AS BIGINT) FROM ($lsql)) AS n_left,
         |      (SELECT CAST(COUNT(*) AS BIGINT) FROM ($rsql)) AS n_right,
         |      (SELECT CAST(COALESCE(MIN(ip), 0) AS BIGINT) FROM (
         |        SELECT l.j, SUM(l.n * r.n) AS ip
         |        FROM (SELECT j, ((a*(k % $HashP) + b) % $HashP) % $CmsW AS bucket,
         |                COUNT(*) AS n FROM ($lsql), consts GROUP BY 1, 2) l
         |        JOIN (SELECT j, ((a*(k % $HashP) + b) % $HashP) % $CmsW AS bucket,
         |                COUNT(*) AS n FROM ($rsql), consts GROUP BY 1, 2) r
         |          ON l.j = r.j AND l.bucket = r.bucket
         |        GROUP BY l.j)) AS est_rows,
         |      (SELECT CAST(COALESCE(MIN(mx), 0) AS BIGINT) FROM (
         |        SELECT l.j, MAX(l.n * r.n) AS mx
         |        FROM (SELECT j, ((a*(k % $HashP) + b) % $HashP) % $CmsW AS bucket,
         |                COUNT(*) AS n FROM ($lsql), consts GROUP BY 1, 2) l
         |        JOIN (SELECT j, ((a*(k % $HashP) + b) % $HashP) % $CmsW AS bucket,
         |                COUNT(*) AS n FROM ($rsql), consts GROUP BY 1, 2) r
         |          ON l.j = r.j AND l.bucket = r.bucket
         |        GROUP BY l.j)) AS hot_out))""".stripMargin
    val liPartL = "SELECT CAST(l_partkey AS BIGINT) AS k, " +
      "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents FROM lineitem"
    val partR = "SELECT CAST(p_partkey AS BIGINT) AS k FROM part"
    val custL = "SELECT CAST(c_nationkey AS BIGINT) AS k, " +
      "CAST(ROUND(c_acctbal*100) AS BIGINT) AS cents FROM customer"
    val natR = "SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation"
    val hotL = "SELECT CAST(CASE WHEN l_orderkey % 10 < 9 THEN 0 " +
      "ELSE l_orderkey % 100 END AS BIGINT) AS k, " +
      "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents FROM lineitem"
    val dimR = "SELECT CAST(p_partkey % 100 AS BIGINT) AS k FROM part GROUP BY 1"
    s"""WITH consts(j, a, b) AS (SELECT * FROM (VALUES $consts))
       |${one("uniform_li_part", liPartL, partR)}
       |UNION ALL
       |${one("small_dim_bcast", custL, natR)}
       |UNION ALL
       |${one("hot_key_salt", hotL, dimR)}""".stripMargin
  }

  override def register(): Unit = {
    Queries.register(QueryDef("s21_join_size_estimate", joinSizeEstimate,
      Some(joinSizeEstimateOracle)))
    Queries.register(QueryDef("j16b_planned_join", plannedJoin,
      Some(plannedJoinOracle)))
    Queries.register(QueryDef("s15_bucketed_join", bucketedJoin, Some(bucketedJoinOracle), bench = true))
    Queries.register(QueryDef("s16_compaction_plan", compactionPlan, Some(compactionOracle)))
    Queries.register(QueryDef("j18_sorted_neighborhood", sortedNeighborhood, Some(snmOracle)))
    Queries.register(QueryDef("s14_table_stats", tableStats, Some(tableStatsOracle)))
    Queries.register(QueryDef("s13_zorder_layout", zorderLayout, Some(zorderLayoutOracle)))
    Queries.register(QueryDef("s19_file_skipping_eval", fileSkippingEval,
      Some(fileSkippingEvalOracle)))
    Queries.register(QueryDef("a8_salted_refcount", saltedRefCount, Some(saltedRefCountOracle)))
    Queries.register(QueryDef("f9_url_normalize", urlNormalize, Some(urlNormalizeOracle)))
    Queries.register(QueryDef("t_shard_balance", shardBalance, Some(shardBalanceOracle)))
    Queries.register(QueryDef("j16_salted_join", saltedJoin, Some(saltedJoinOracle)))
  }
}
