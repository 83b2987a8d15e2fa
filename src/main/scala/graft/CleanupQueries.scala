package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{DateLib, Periods}
import graft.pipeline.Validator

/** The round-4 small-operator batch: M11 period parsing, M12 internal-
  * source cleanups, M16 schema validation, F3 timespan walk tables, K5
  * index CSV export. Each is map-only or one aggregation — the 100 TB
  * story is uniform: no shuffles beyond the declared groupBys. */
object CleanupQueries extends QueryGroup {

  /** M11: Period records derive a timespan from their primary name
    * (century phrases, century ranges, "Dynasty, YYYY-YYYY" comma tails,
    * plain year ranges); unparseable names yield none. Every record
    * gains the AAT Period classification. */
  def periodParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select($"c_custkey".cast("long")).as[Long].map { ck =>
        val c = (ck % 20 + 1).toInt
        val c2 = c + (ck % 3).toInt
        val y = 1000 + (ck % 800)
        val content = (ck % 6) match {
          case 0 => s"${c}th century"
          case 1 => s"early ${c}th century"
          case 2 => s"${c}th century - ${c2}th century"
          case 3 => s"Kingdom Era, $y-${y + 135}"
          case 4 => s"Aetas $ck"
          case _ => s"$y - ${y + 135}"
        }
        val ts = Periods.periodTimespan(content)
        (ck, content, ts.map(_.begin).orNull, ts.map(_.end).orNull,
          Periods.PeriodClass)
      }.toDF("id", "content", "begin", "end", "period_class")
  }
  private val periodParseOracle: String =
    """WITH b AS (
      |  SELECT c_custkey AS ck, c_custkey % 6 AS v,
      |    c_custkey % 20 + 1 AS c,
      |    c_custkey % 20 + 1 + c_custkey % 3 AS c2,
      |    1000 + c_custkey % 800 AS y
      |  FROM customer),
      |f AS (
      |  SELECT ck, v, c, c2, y,
      |    (c - 1) * 100 AS sy, (c - 1) * 100 + 99 AS ey,
      |    (c2 - 1) * 100 + 99 AS ey2
      |  FROM b)
      |SELECT ck AS id,
      |  CASE v WHEN 0 THEN c || 'th century'
      |    WHEN 1 THEN 'early ' || c || 'th century'
      |    WHEN 2 THEN c || 'th century - ' || c2 || 'th century'
      |    WHEN 3 THEN 'Kingdom Era, ' || y || '-' || (y + 135)
      |    WHEN 4 THEN 'Aetas ' || ck
      |    ELSE y || ' - ' || (y + 135) END AS content,
      |  CASE v WHEN 0 THEN lpad(CAST(sy AS VARCHAR), 4, '0') || '-01-01T00:00:00'
      |    WHEN 1 THEN lpad(CAST(sy AS VARCHAR), 4, '0') || '-01-01T00:00:00'
      |    WHEN 2 THEN lpad(CAST(sy AS VARCHAR), 4, '0') || '-01-01T00:00:00'
      |    WHEN 3 THEN y || '-01-01T00:00:00'
      |    WHEN 4 THEN NULL
      |    ELSE y || '-01-01T00:00:00' END AS begin,
      |  CASE v WHEN 0 THEN lpad(CAST(ey AS VARCHAR), 4, '0') || '-12-31T23:59:59'
      |    WHEN 1 THEN lpad(CAST(ey AS VARCHAR), 4, '0') || '-12-31T23:59:59'
      |    WHEN 2 THEN lpad(CAST(ey2 AS VARCHAR), 4, '0') || '-12-31T23:59:59'
      |    WHEN 3 THEN (y + 135) || '-12-31T23:59:59'
      |    WHEN 4 THEN NULL
      |    ELSE (y + 135) || '-12-31T23:59:59' END AS "end",
      |  'http://vocab.getty.edu/aat/300081446' AS period_class
      |FROM f""".stripMargin

  /** M12: the internal-source (YCBA-style) cleanups as columnar array
    * ops (`sources/yale/ycba/mapper.py:29-118`): statement content
    * list→scalar, vendor-URI purge from represents, the double-AAT
    * prefix fix (VisualItem only), wikidata-equivalent purge for
    * HumanMadeObject, Collection-Item classification from item-classed
    * identifiers, GeoJSON point→WKT for Places. */
  def ycbaClean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ck = $"c_custkey".cast("long")
    val rtype = when(ck % 4 === 0, "VisualItem")
      .when(ck % 4 === 1, "HumanMadeObject")
      .when(ck % 4 === 2, "Place").otherwise("LinguisticObject")
    val doubleAat = concat(
      lit("http://vocab.getty.edu/aat/http://vocab.getty.edu/aat/300"), ck)
    val cleanAat = concat(lit("http://vocab.getty.edu/aat/300"), ck)
    val represents = array(
      concat(lit("http://collection.britishart.yale.edu/x"), ck),
      when(ck % 2 === 0, doubleAat).otherwise(cleanAat),
      concat(lit("https://en.wikipedia.org/wiki/W"), ck))
    val equivalent = when(ck % 3 === 0,
        array(concat(lit("http://www.wikidata.org/entity/Q"), ck),
          concat(lit("https://viaf.org/viaf/"), ck)))
      .otherwise(array(concat(lit("https://viaf.org/viaf/"), ck)))
    val geojson = concat(lit("""{"features":[{"geometry":{"type":"Point","coordinates":["""),
      ck % 180, lit(".5,"), ck % 90, lit(".5]}}]}"))
    val base = Tables.load(spark, dir, "customer").select(ck.as("id"),
      rtype.as("rtype"),
      array(concat(lit("stmt"), ck), lit("extra")).as("content_list"),
      represents.as("represents"), equivalent.as("equivalent"),
      (ck % 5 === 0).as("item_classed"), geojson.as("defined_by"))
    val purged = filter($"represents", x =>
      !x.startsWith("http://collection.britishart.yale.edu/") &&
        !x.startsWith("https://en.wikipedia.org/wiki/"))
    val repFixed = when($"rtype" === "VisualItem",
      transform(purged, x => regexp_replace(x,
        java.util.regex.Pattern.quote("http://vocab.getty.edu/aat/http://vocab.getty.edu/aat/"),
        "http://vocab.getty.edu/aat/"))).otherwise(purged)
    val eqKept = when($"rtype" === "HumanMadeObject",
        filter($"equivalent", x => !x.contains("wikidata.org")))
      .otherwise($"equivalent")
    val geoSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("features",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("geometry",
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("type",
                  org.apache.spark.sql.types.StringType),
                org.apache.spark.sql.types.StructField("coordinates",
                  org.apache.spark.sql.types.ArrayType(
                    org.apache.spark.sql.types.DoubleType)))))))))))
    val geom = from_json($"defined_by", geoSchema)
      .getField("features").getItem(0).getField("geometry")
    val wkt = when($"rtype" === "Place" && geom.getField("type") === "Point",
      concat(lit("POINT("), geom.getField("coordinates").getItem(0).cast("string"),
        lit(" "), geom.getField("coordinates").getItem(1).cast("string"), lit(")")))
    base.select($"id", $"rtype",
      element_at($"content_list", 1).as("stmt"),
      concat_ws(",", repFixed).as("rep_csv"),
      size(eqKept).cast("long").as("n_equiv"),
      $"item_classed".as("is_collection_item"),
      wkt.as("wkt"))
  }
  private val ycbaCleanOracle: String =
    """SELECT c_custkey AS id,
      |  CASE c_custkey % 4 WHEN 0 THEN 'VisualItem' WHEN 1 THEN 'HumanMadeObject'
      |    WHEN 2 THEN 'Place' ELSE 'LinguisticObject' END AS rtype,
      |  'stmt' || c_custkey AS stmt,
      |  CASE WHEN c_custkey % 2 = 0 AND c_custkey % 4 <> 0
      |    THEN 'http://vocab.getty.edu/aat/http://vocab.getty.edu/aat/300' || c_custkey
      |    ELSE 'http://vocab.getty.edu/aat/300' || c_custkey END AS rep_csv,
      |  CAST(CASE WHEN c_custkey % 4 = 1 THEN 1
      |    WHEN c_custkey % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_equiv,
      |  (c_custkey % 5 = 0) AS is_collection_item,
      |  CASE WHEN c_custkey % 4 = 2 THEN 'POINT(' || (c_custkey % 180) || '.5 '
      |    || (c_custkey % 90) || '.5)' END AS wkt
      |FROM customer""".stripMargin

  /** M16: declarative schema validation over synthesized property sets —
    * missing required props, unknown classes, additionalProperties with
    * the underscore exemption, concept subtypes sharing Type's schema. */
  def validate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select($"c_custkey".cast("long")).as[Long].map { ck =>
        val (rtype, props) = (ck % 6) match {
          case 0 => ("Person", Seq("id", "identified_by", "born", "_extra"))
          case 1 => ("Person", Seq("id", "born")) // missing identified_by
          case 2 => ("Material", Seq("id", "identified_by", "broader")) // Type schema
          case 3 => ("HumanMadeObject",
            Seq("id", "identified_by", "produced_by", "bogus_prop"))
          case 4 => ("Frobnicator", Seq("id")) // unknown class
          case _ => ("Place", Seq("id", "identified_by", "defined_by"))
        }
        val errs = Validator.validate(rtype, props)
        (ck, rtype, errs.size.toLong, errs.mkString(";"))
      }.toDF("id", "rtype", "n_errors", "errors")
  }
  private val validateOracle: String =
    """SELECT c_custkey AS id,
      |  CASE c_custkey % 6 WHEN 0 THEN 'Person' WHEN 1 THEN 'Person'
      |    WHEN 2 THEN 'Material' WHEN 3 THEN 'HumanMadeObject'
      |    WHEN 4 THEN 'Frobnicator' ELSE 'Place' END AS rtype,
      |  CAST(CASE c_custkey % 6 WHEN 1 THEN 1 WHEN 3 THEN 1 WHEN 4 THEN 1
      |    ELSE 0 END AS BIGINT) AS n_errors,
      |  CASE c_custkey % 6 WHEN 0 THEN '' WHEN 1 THEN 'missing:identified_by'
      |    WHEN 2 THEN '' WHEN 3 THEN 'additional:bogus_prop'
      |    WHEN 4 THEN 'unknown_class:Frobnicator' ELSE '' END AS errors
      |FROM customer""".stripMargin

  /** F3: the timespan walk tables — per record class the event
    * properties that may carry timespans (mapper_utils.py:34-54,
    * including the reference's literal "dissoved_by" spelling), and the
    * per-timestamp-property fix: begin_* properties clamp to the parsed
    * interval begin, end_* to its end, unparseable values are stripped
    * (mapper_utils.py:87-108). */
  val timeRectype: Map[String, Seq[String]] = Map(
    "Person" -> Seq("born", "died", "carried_out", "participated_in"),
    "Group" -> Seq("formed_by", "dissoved_by", "carried_out", "participated_in"),
    "HumanMadeObject" -> Seq("produced_by", "encountered_by", "destroyed_by"),
    "DigitalObject" -> Seq("created_by", "used_for"),
    "Set" -> Seq("created_by", "used_for", "members_exemplified_by"),
    "LinguisticObject" -> Seq("created_by", "used_for"),
    "VisualItem" -> Seq("created_by", "used_for"),
    "Event" -> Seq("timespan"), "Activity" -> Seq("timespan"),
    "Period" -> Seq("timespan"),
    "Type" -> Nil, "Material" -> Nil, "Language" -> Nil, "Currency" -> Nil,
    "Place" -> Nil, "MeasurementUnit" -> Nil)

  val timestampProps: Seq[String] = Seq("begin_of_the_begin",
    "end_of_the_begin", "begin_of_the_end", "end_of_the_end")

  def timespanWalk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fix = udf((tsp: String, raw: String) => {
      val v = if (raw != null && raw.endsWith("Z")) raw.dropRight(1) else raw
      DateLib.makeDatetime(v).map(r =>
        if (tsp.startsWith("begin")) r.begin else r.end).orNull
    })
    val pathTable = timeRectype.toSeq
      .flatMap { case (t, ps) => ps.map(t -> _) }
      .toDF("rtype", "prop")
    val rows = Tables.load(spark, dir, "customer")
      .select($"c_custkey".cast("long")).as[Long].map { ck =>
        val rtype = (ck % 4) match {
          case 0 => "Person" case 1 => "Group"
          case 2 => "HumanMadeObject" case _ => "Place"
        }
        val prop = (ck % 4) match {
          case 0 => if (ck % 2 == 0) "born" else "bogus_prop"
          case 1 => "formed_by"
          case 2 => "produced_by"
          case _ => "born" // invalid for Place: walk tables drop it
        }
        val raw = (ck % 5) match {
          case 0 => "1987-04-12T10:30:00Z"
          case 1 => "1987-04"
          case 2 => "19870412"
          case 3 => "garbage!!"
          case _ => "9999-01-01"
        }
        (ck, rtype, prop, timestampProps(((ck % 4)).toInt), raw)
      }.toDF("id", "rtype", "prop", "tsp", "raw")
    rows.join(broadcast(pathTable), Seq("rtype", "prop"), "left_semi")
      .select($"id", $"rtype", $"prop", $"tsp", fix($"tsp", $"raw").as("fixed"))
  }
  private val timespanWalkOracle: String =
    """WITH b AS (
      |  SELECT c_custkey AS ck, c_custkey % 4 AS t, c_custkey % 5 AS v
      |  FROM customer
      |  WHERE c_custkey % 4 IN (1, 2)
      |     OR (c_custkey % 4 = 0 AND c_custkey % 2 = 0))
      |SELECT ck AS id,
      |  CASE t WHEN 0 THEN 'Person' WHEN 1 THEN 'Group'
      |    ELSE 'HumanMadeObject' END AS rtype,
      |  CASE t WHEN 0 THEN 'born' WHEN 1 THEN 'formed_by'
      |    ELSE 'produced_by' END AS prop,
      |  CASE t WHEN 0 THEN 'begin_of_the_begin' WHEN 1 THEN 'end_of_the_begin'
      |    WHEN 2 THEN 'begin_of_the_end' ELSE 'end_of_the_end' END AS tsp,
      |  CASE WHEN v IN (3, 4) THEN NULL
      |    WHEN t IN (0, 2) THEN -- begin_* props
      |      CASE v WHEN 0 THEN '1987-04-12T10:30:00'
      |        WHEN 1 THEN '1987-04-01T00:00:00' ELSE '1987-04-12T00:00:00' END
      |    ELSE -- end_* props
      |      CASE v WHEN 0 THEN '1987-04-12T10:30:00'
      |        WHEN 1 THEN '1987-04-30T23:59:59' ELSE '1987-04-12T23:59:59' END
      |  END AS fixed
      |FROM b""".stripMargin

  /** K5: the index CSV export shape — (key, tab-joined values) rows from
    * the name index (index_loader.py:141-148); the physical CSV write is
    * the Spark csv writer (spec'd roundtrip). */
  def indexCsv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "part")
      .select(lower(element_at(split($"p_name", " "), 1)).as("key"), $"p_partkey")
      .groupBy($"key")
      .agg(concat_ws("\t",
        transform(array_sort(collect_list($"p_partkey")), _.cast("string")))
        .as("value"))
  }
  private val indexCsvOracle: String =
    """SELECT lower(string_split(p_name, ' ')[1]) AS key,
      |  array_to_string(list(CAST(p_partkey AS VARCHAR) ORDER BY p_partkey),
      |    chr(9)) AS value
      |FROM part GROUP BY 1""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("m11_period_parse", periodParse, Some(periodParseOracle)))
    Queries.register(QueryDef("m12_ycba_clean", ycbaClean, Some(ycbaCleanOracle)))
    Queries.register(QueryDef("m16_validate", validate, Some(validateOracle)))
    Queries.register(QueryDef("f3_timespan_walk", timespanWalk, Some(timespanWalkOracle)))
    Queries.register(QueryDef("k5_index_csv", indexCsv, Some(indexCsvOracle)))
  }
}