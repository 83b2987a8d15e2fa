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

  /** F15: the Hebrew-calendar conversion on the query path
    * (`mapper_utils.py:200-211` via DateLib's >4500 year gate) — molad
    * elapsed-days, the four postponement rules, deficient/full year
    * month lengths, civil-order month offsets and the RD→proleptic-
    * Gregorian conversion, ALL replayed by the oracle as integer
    * arithmetic (no calendar functions on either side). Years 5650-5849
    * span leap and non-leap cycles; months Tishrei/Kislev/Nisan hit the
    * zero-offset, deficient-year and full-civil-walk paths. */
  def hebrewDates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select($"c_custkey".cast("long")).as[Long].map { ck =>
        val hy = (5650 + ck % 200).toInt
        val hm = (ck % 3) match { case 0 => 7; case 1 => 9; case _ => 1 }
        val hd = (1 + ck % 28).toInt // <= 28: valid in every month
        val s = f"$hy-$hm%02d-$hd%02d"
        val r = DateLib.makeDatetime(s).get
        (ck, s, r.begin, r.end)
      }.toDF("id", "hdate", "begin", "end")
  }
  private val hebrewDatesOracle: String =
    """WITH b AS (SELECT CAST(c_custkey AS BIGINT) AS ck FROM customer),
      |h AS (SELECT ck, 5650 + ck % 200 AS hy,
      |  CASE ck % 3 WHEN 0 THEN 7 WHEN 1 THEN 9 ELSE 1 END AS hm,
      |  1 + ck % 28 AS hd FROM b),
      |y2 AS (SELECT ck, hy, unnest([hy, hy + 1]) AS yy FROM h),
      |e1 AS (SELECT *, 235*((yy-1)//19) + 12*((yy-1)%19)
      |  + (7*((yy-1)%19)+1)//19 AS me FROM y2),
      |e2 AS (SELECT *, 204 + 793*(me % 1080) AS pe FROM e1),
      |e3 AS (SELECT *, 5 + 12*me + 793*(me//1080) + pe//1080 AS he FROM e2),
      |e4 AS (SELECT *, 1 + 29*me + he//24 AS day,
      |  (he % 24)*1080 + pe % 1080 AS parts FROM e3),
      |e5 AS (SELECT *, day + CASE WHEN parts >= 19440
      |    OR (day % 7 = 2 AND parts >= 9924 AND NOT ((7*yy+1) % 19 < 7))
      |    OR (day % 7 = 1 AND parts >= 16789 AND ((7*(yy-1)+1) % 19 < 7))
      |  THEN 1 ELSE 0 END AS pp FROM e4),
      |e6 AS (SELECT ck, yy, hy,
      |  pp + CASE WHEN pp % 7 IN (0, 3, 5) THEN 1 ELSE 0 END AS ed FROM e5),
      |ee AS (SELECT ck, MAX(CASE WHEN yy = hy THEN ed END) AS ed_y,
      |  MAX(CASE WHEN yy = hy + 1 THEN ed END) AS ed_y1
      |  FROM e6 GROUP BY ck),
      |f AS (SELECT h.ck, hy, hm, hd, ed_y, ed_y1 - ed_y AS ylen,
      |  ((7*hy+1) % 19 < 7) AS leap FROM h JOIN ee ON h.ck = ee.ck),
      |g AS (SELECT *, CASE WHEN ylen % 10 = 5 THEN 30 ELSE 29 END AS hesh,
      |  CASE WHEN ylen % 10 = 3 THEN 29 ELSE 30 END AS kis FROM f),
      |o AS (SELECT *, CASE hm WHEN 7 THEN 0 WHEN 9 THEN 30 + hesh
      |  ELSE 30 + hesh + kis + 29 + 30
      |    + (CASE WHEN leap THEN 30 ELSE 29 END)
      |    + (CASE WHEN leap THEN 29 ELSE 0 END) END AS off FROM g),
      |r AS (SELECT ck, hy, hm, hd,
      |  ed_y - 1373428 + off + (hd - 1) AS rd FROM o),
      |g2 AS (SELECT *, (rd-1)//146097 AS n400, (rd-1)%146097 AS d1 FROM r),
      |g3 AS (SELECT *, d1//36524 AS n100, d1%36524 AS d2 FROM g2),
      |g4 AS (SELECT *, d2//1461 AS n4, d2%1461 AS d3 FROM g3),
      |g5 AS (SELECT *, d3//365 AS n1 FROM g4),
      |g6 AS (SELECT *, 400*n400 + 100*n100 + 4*n4 + n1
      |  + CASE WHEN n100 = 4 OR n1 = 4 THEN 0 ELSE 1 END AS gy FROM g5),
      |g7 AS (SELECT *,
      |  rd - (365*(gy-1) + (gy-1)//4 - (gy-1)//100 + (gy-1)//400 + 1) AS doy,
      |  CASE WHEN (gy % 4 = 0 AND gy % 100 <> 0) OR gy % 400 = 0
      |    THEN 1 ELSE 0 END AS la FROM g6),
      |g8 AS (SELECT *, [0, 31, 59+la, 90+la, 120+la, 151+la, 181+la,
      |  212+la, 243+la, 273+la, 304+la, 334+la] AS bef FROM g7),
      |g9 AS (SELECT *, len(list_filter(bef, x -> x <= doy)) AS gm FROM g8),
      |g10 AS (SELECT ck, hy, hm, hd, gy, gm,
      |  doy - bef[CAST(gm AS INT)] + 1 AS gd FROM g9)
      |SELECT ck AS id,
      |  hy || '-' || lpad(CAST(hm AS VARCHAR), 2, '0') || '-'
      |    || lpad(CAST(hd AS VARCHAR), 2, '0') AS hdate,
      |  gy || '-' || lpad(CAST(gm AS VARCHAR), 2, '0') || '-'
      |    || lpad(CAST(gd AS VARCHAR), 2, '0') || 'T00:00:00' AS begin,
      |  gy || '-' || lpad(CAST(gm AS VARCHAR), 2, '0') || '-'
      |    || lpad(CAST(gd AS VARCHAR), 2, '0') || 'T23:59:59' AS "end"
      |FROM g10""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("f15_hebrew_dates", hebrewDates, Some(hebrewDatesOracle)))
    Queries.register(QueryDef("f5f12_bce_epoch", bceEpoch, Some(bceEpochOracle)))
    Queries.register(QueryDef("m9_patch_records", patchRecords, Some(patchRecordsOracle)))
    Queries.register(QueryDef("m10_reclass", reclass, Some(reclassOracle)))
    Queries.register(QueryDef("f13_lang_map", langMap, Some(langMapOracle)))
    Queries.register(QueryDef("f4_lifespan_check", lifespanCheck, Some(lifespanCheckOracle)))
  }
}
