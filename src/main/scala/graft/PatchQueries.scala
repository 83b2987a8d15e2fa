package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DateLib

/** Small per-record patch/validation operators: data-driven record
  * patches (M9/M10), the ISO-639 literal language map (F13), and
  * birth/death sanity on the query path (F4). */
object PatchQueries extends QueryGroup {

  /** M9/M10: data-driven record patches — a patch table keyed by doc_id
    * carries DELETE/UPDATE ops applied by left join + conditional
    * projection (the declarative form of the xpath patch walk). */
  def patchRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    // patch table derived deterministically: every 7th doc deletes its
    // lang; every 11th rewrites source to 'curated'
    val patches = docs.select($"doc_id",
        when($"doc_id" % 7 === 0, "DELETE_LANG")
          .when($"doc_id" % 11 === 0, "UPDATE_SOURCE")
          .otherwise(null).as("op"))
      .filter($"op".isNotNull)
    docs.join(patches, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"op" === "DELETE_LANG", lit(null).cast("string"))
          .otherwise($"lang").as("lang"),
        when($"op" === "UPDATE_SOURCE", "curated")
          .otherwise($"source").as("source"))
  }
  private val patchRecordsOracle: String =
    """WITH patches AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN 'DELETE_LANG'
      |         WHEN doc_id % 11 = 0 THEN 'UPDATE_SOURCE' END AS op
      |  FROM documents
      |  WHERE doc_id % 7 = 0 OR doc_id % 11 = 0)
      |SELECT d.doc_id,
      |  CASE WHEN op = 'DELETE_LANG' THEN NULL ELSE lang END AS lang,
      |  CASE WHEN op = 'UPDATE_SOURCE' THEN 'curated' ELSE source END AS source
      |FROM documents d LEFT JOIN patches p ON d.doc_id = p.doc_id""".stripMargin

  /** M10 post_reconcile (`process/base/mapper.py:434-440`): equivalent-
    * driven reclass of `Type` records — the FIRST equivalent present in
    * the type_overrides table rewrites the record type (Material /
    * Language / ...). As an operator: posexplode the equivalents of Type
    * records, broadcast-join the (small) overrides table, min_by on the
    * claim position for first-match-wins, left-join back. One map-side
    * stage at any corpus size — the overrides table is a dim table, never
    * a shuffle key. */
  def reclass(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def aat(k: org.apache.spark.sql.Column) =
      concat(lit("http://vocab.getty.edu/aat/3000"), k.cast("string"))
    val docs = Tables.load(spark, dir, "customer")
      .select($"c_custkey".cast("long").as("id"))
      .select($"id",
        when($"id" % 3 === 0, "Type")
          .when($"id" % 2 === 0, "Person").otherwise("Group").as("rtype"),
        when($"id" % 2 === 0, array(aat($"id" % 40), aat(($"id" + 1) % 40)))
          .otherwise(array(aat($"id" % 40))).as("equivalent"))
    // the type_overrides.json analog: a small dim table
    val overrides = spark.range(40).select(
        aat($"id").as("uri"),
        when($"id" % 4 === 1, "Material")
          .when($"id" % 4 === 2, "Language").as("new_type"))
      .filter($"new_type".isNotNull)
    val hits = docs.filter($"rtype" === "Type") // post_reconcile: Type only
      .select($"id", posexplode($"equivalent"))
      .toDF("id", "pos", "uri")
      .join(broadcast(overrides), "uri")
      .groupBy($"id").agg(min_by($"new_type", $"pos").as("override_type"))
    docs.join(hits, Seq("id"), "left")
      .select($"id", coalesce($"override_type", $"rtype").as("rtype"))
  }
  private val reclassOracle: String =
    """SELECT c_custkey AS id,
      |  CASE WHEN c_custkey % 3 <> 0 THEN
      |      CASE WHEN c_custkey % 2 = 0 THEN 'Person' ELSE 'Group' END
      |    WHEN (c_custkey % 40) % 4 = 1 THEN 'Material'
      |    WHEN (c_custkey % 40) % 4 = 2 THEN 'Language'
      |    WHEN c_custkey % 2 = 0 AND ((c_custkey + 1) % 40) % 4 = 1 THEN 'Material'
      |    WHEN c_custkey % 2 = 0 AND ((c_custkey + 1) % 40) % 4 = 2 THEN 'Language'
      |    ELSE 'Type' END AS rtype
      |FROM customer""".stripMargin

  /** F13: ISO-639 2-letter -> 3-letter literal map (the reference keeps
    * the 70-entry inverse map as a literal, `process/base/mapper.py:47-112`). */
  def langMap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val iso3 = typedLit(Map("en" -> "eng", "de" -> "deu", "fr" -> "fra",
      "es" -> "spa", "zh" -> "zho"))
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang",
        coalesce(element_at(iso3, $"lang"), lit("und")).as("lang3"))
  }
  private val langMapOracle: String =
    """SELECT doc_id, lang,
      |  CASE lang WHEN 'en' THEN 'eng' WHEN 'de' THEN 'deu' WHEN 'fr' THEN 'fra'
      |            WHEN 'es' THEN 'spa' WHEN 'zh' THEN 'zho' ELSE 'und' END AS lang3
      |FROM documents""".stripMargin

  /** F4: birth/death sanity on the query path — per customer, first/last
    * order dates as a pseudo-lifespan validated by DateLib (<= 122 years,
    * end after start; always true here, but the validation runs). */
  def lifespanCheck(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val plausible = udf((b: String, d: String) => DateLib.plausibleLifespan(b, d))
    Tables.load(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(date_format(min($"o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("first_seen"),
        date_format(max($"o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("last_seen"))
      .select($"o_custkey", $"first_seen", $"last_seen",
        plausible($"first_seen", $"last_seen").as("plausible"))
  }
  private val lifespanCheckOracle: String =
    """SELECT o_custkey,
      |  strftime(MIN(o_orderdate), '%Y-%m-%dT%H:%M:%S') AS first_seen,
      |  strftime(MAX(o_orderdate), '%Y-%m-%dT%H:%M:%S') AS last_seen,
      |  (epoch(MAX(o_orderdate)) >= epoch(MIN(o_orderdate))
      |   AND epoch(MAX(o_orderdate)) - epoch(MIN(o_orderdate))
      |       <= CAST(122 AS BIGINT)*365*24*3600 + 30*24*3600) AS plausible
      |FROM orders GROUP BY o_custkey""".stripMargin

  /** F5+F12 on the query path: BCE-aware year extraction and proleptic
    * epoch seconds over a mixed-precision date corpus (full timestamps,
    * BCE date-only, year-one, leap days, garbage). The oracle
    * regenerates the same strings, parses the year back with string
    * ops, and replays epochSeconds with the era-based civil-days
    * formula — years shifted +40000 (100 Gregorian eras) so DuckDB's
    * truncating `//` equals floor division, then 100*146097 days
    * subtracted back. Validated against java.time's proleptic ISO
    * calendar (which is what DateLib.epochSeconds uses). */
  def bceEpoch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select($"c_custkey".cast("long")).as[Long].map { ck =>
        val iso = (ck % 6) match {
          case 0 => f"${1900 + ck % 150}%04d-03-15T${ck % 24}%02d:${ck % 60}%02d:${(ck * 7) % 60}%02d"
          case 1 => f"-${ck % 500 + 1}%04d-07-02"
          case 2 => "0001-01-01"
          case 3 => f"${2000 + (ck % 24) * 4}%04d-02-29"
          case 4 => "1600-02-29T23:59:59"
          case _ => "garbage"
        }
        val yr: java.lang.Long =
          DateLib.yearOf(iso).map(y => java.lang.Long.valueOf(y.toLong)).orNull
        val ep: java.lang.Long =
          DateLib.epochSeconds(iso).map(java.lang.Long.valueOf).orNull
        (ck, iso, yr, ep)
      }.toDF("ident", "iso", "year", "epoch")
  }
  private val bceEpochOracle: String =
    """WITH b AS (SELECT c_custkey AS ck FROM customer),
      |g AS (
      |  SELECT ck,
      |    CASE ck % 6
      |      WHEN 0 THEN lpad(CAST(1900 + ck % 150 AS VARCHAR), 4, '0')
      |        || '-03-15T' || lpad(CAST(ck % 24 AS VARCHAR), 2, '0')
      |        || ':' || lpad(CAST(ck % 60 AS VARCHAR), 2, '0')
      |        || ':' || lpad(CAST((ck * 7) % 60 AS VARCHAR), 2, '0')
      |      WHEN 1 THEN '-' || lpad(CAST(ck % 500 + 1 AS VARCHAR), 4, '0') || '-07-02'
      |      WHEN 2 THEN '0001-01-01'
      |      WHEN 3 THEN lpad(CAST(2000 + (ck % 24) * 4 AS VARCHAR), 4, '0') || '-02-29'
      |      WHEN 4 THEN '1600-02-29T23:59:59'
      |      ELSE 'garbage' END AS iso
      |  FROM b),
      |p AS (
      |  SELECT ck,
      |    CASE ck % 6 WHEN 0 THEN 1900 + ck % 150 WHEN 1 THEN -(ck % 500 + 1)
      |      WHEN 2 THEN 1 WHEN 3 THEN 2000 + (ck % 24) * 4 WHEN 4 THEN 1600 END AS y,
      |    CASE ck % 6 WHEN 0 THEN 3 WHEN 1 THEN 7 WHEN 2 THEN 1 ELSE 2 END AS m,
      |    CASE ck % 6 WHEN 0 THEN 15 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 29 END AS d,
      |    CASE ck % 6 WHEN 0 THEN ck % 24 WHEN 4 THEN 23 ELSE 0 END AS h,
      |    CASE ck % 6 WHEN 0 THEN ck % 60 WHEN 4 THEN 59 ELSE 0 END AS mi,
      |    CASE ck % 6 WHEN 0 THEN (ck * 7) % 60 WHEN 4 THEN 59 ELSE 0 END AS s
      |  FROM b),
      |e1 AS (SELECT *, y + 40000 AS yy FROM p),
      |e2 AS (SELECT *, yy - CASE WHEN m <= 2 THEN 1 ELSE 0 END AS y2 FROM e1),
      |e3 AS (SELECT *, y2 // 400 AS era, y2 % 400 AS yoe FROM e2),
      |e4 AS (SELECT *,
      |  (153 * (m + CASE WHEN m > 2 THEN -3 ELSE 9 END) + 2) // 5 + d - 1 AS doy
      |  FROM e3),
      |e5 AS (SELECT *, yoe * 365 + yoe // 4 - yoe // 100 + doy AS doe FROM e4),
      |e6 AS (SELECT *,
      |  CAST(era AS BIGINT) * 146097 + doe - 719468 - 14609700 AS days FROM e5)
      |SELECT g.ck AS ident, g.iso,
      |  CASE WHEN g.ck % 6 = 5 THEN NULL
      |       WHEN starts_with(g.iso, '-')
      |         THEN -CAST(string_split_regex(g.iso[2:], '[-T]')[1] AS BIGINT)
      |       ELSE CAST(string_split_regex(g.iso, '[-T]')[1] AS BIGINT) END AS year,
      |  CASE WHEN g.ck % 6 = 5 THEN NULL
      |       ELSE days * 86400 + h * 3600 + mi * 60 + s END AS epoch
      |FROM e6 JOIN g USING (ck)""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("f5f12_bce_epoch", bceEpoch, Some(bceEpochOracle)))
    Queries.register(QueryDef("m9_patch_records", patchRecords, Some(patchRecordsOracle)))
    Queries.register(QueryDef("m10_reclass", reclass, Some(reclassOracle)))
    Queries.register(QueryDef("f13_lang_map", langMap, Some(langMapOracle)))
    Queries.register(QueryDef("f4_lifespan_check", lifespanCheck, Some(lifespanCheckOracle)))
  }
}
