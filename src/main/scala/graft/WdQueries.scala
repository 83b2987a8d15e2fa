package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.{WdClaims, WdReconcile, WdTypes}
import graft.pipeline.WdClaims.WdDate

/** M3-M5: the wikidata claim mappers (`wikidata/mapper.py:297-658`) as
  * oracle-checked queries. Claims are synthesized deterministically from
  * `customer` and pushed through the pure WdClaims lib inside a typed
  * Dataset.map — the per-source mapper shape of SURVEY §2.3: map-only,
  * shuffle-free, embarrassingly parallel at any scale. The oracles replay
  * each processor's decision tree as CASE expressions. */
object WdQueries extends QueryGroup {

  final case class M3Out(id: Long, label: String, names: String, descs: String)

  /** M3 process_labels: must-have langs in order, content dedupe with
    * language union, all-langs fallback (incl. the no-language `mul`
    * append), must-have descriptions. */
  def labels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val pref = Seq(("ru", s"ru${ck % 7}")) ++
          (if (ck % 3 != 0) Seq(("en", s"nm${ck % 50}")) else Nil) ++
          (if (ck % 4 != 0)
            Seq(("fr", if (ck % 5 == 0) s"nm${ck % 50}" else s"fr${ck % 50}"))
          else Nil) ++
          (if (ck % 11 == 0) Seq(("mul", s"mul${ck % 9}")) else Nil)
        val desc = (if (ck % 2 == 0) Seq(("en", s"d${ck % 30}")) else Nil) ++
          Seq(("ru", "never processed: not a must-have lang"))
        val r = WdClaims.processLabels(pref, desc)
        M3Out(ck, r.label.orNull,
          r.names.map(n => s"${n.content}|${n.languages.mkString(",")}").mkString(";"),
          r.descriptions.map(d => s"${d.content}|${d.languages.mkString(",")}").mkString(";"))
      }.toDF()
  }

  /** The label fold replayed: en processed before fr (must-have order);
    * same-content fr merges into the en name's language list; when
    * neither must-have lang is present the fallback walks the claim
    * order (ru, then mul — mul appended without a language). */
  private val labelsOracle: String =
    """SELECT c_custkey AS id,
      |  CASE WHEN c_custkey % 3 <> 0 THEN 'nm' || CAST(c_custkey % 50 AS VARCHAR)
      |    WHEN c_custkey % 4 <> 0 THEN
      |      CASE WHEN c_custkey % 5 = 0 THEN 'nm' || CAST(c_custkey % 50 AS VARCHAR)
      |        ELSE 'fr' || CAST(c_custkey % 50 AS VARCHAR) END
      |    ELSE 'ru' || CAST(c_custkey % 7 AS VARCHAR) END AS label,
      |  CASE
      |    WHEN c_custkey % 3 <> 0 AND c_custkey % 4 <> 0 AND c_custkey % 5 = 0
      |      THEN 'nm' || CAST(c_custkey % 50 AS VARCHAR) || '|en,fr'
      |    WHEN c_custkey % 3 <> 0 AND c_custkey % 4 <> 0
      |      THEN 'nm' || CAST(c_custkey % 50 AS VARCHAR) || '|en;fr'
      |        || CAST(c_custkey % 50 AS VARCHAR) || '|fr'
      |    WHEN c_custkey % 3 <> 0
      |      THEN 'nm' || CAST(c_custkey % 50 AS VARCHAR) || '|en'
      |    WHEN c_custkey % 4 <> 0 AND c_custkey % 5 = 0
      |      THEN 'nm' || CAST(c_custkey % 50 AS VARCHAR) || '|fr'
      |    WHEN c_custkey % 4 <> 0
      |      THEN 'fr' || CAST(c_custkey % 50 AS VARCHAR) || '|fr'
      |    ELSE 'ru' || CAST(c_custkey % 7 AS VARCHAR) || '|ru'
      |      || CASE WHEN c_custkey % 11 = 0
      |           THEN ';mul' || CAST(c_custkey % 9 AS VARCHAR) || '|'
      |           ELSE '' END
      |  END AS names,
      |  CASE WHEN c_custkey % 2 = 0
      |    THEN 'd' || CAST(c_custkey % 30 AS VARCHAR) || '|en'
      |    ELSE '' END AS descs
      |FROM customer""".stripMargin

  final case class M4Out(id: Long, n_eqs: Long, eqs: String)

  /** M4 process_equivalents: ext_hash template expansion in table order,
    * the P244 s/n authority split (unknown prefixes dropped), WOF
    * 3-digit path chunking. */
  def equivalents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val claims = Map(
          "P2163" -> (if (ck % 2 == 0) Seq(s"${ck % 1000}") else Nil),
          "P1014" -> (if (ck % 3 == 0) Seq(s"3000${ck % 100}") else Nil),
          "P214" -> (if (ck % 5 == 0) Seq(s"${ck % 500}", s"${ck % 500 + 1}") else Nil),
          "P244" -> Seq((ck % 3) match {
            case 0 => s"n$ck"
            case 1 => s"s$ck"
            case _ => s"x$ck" // unknown LC authority: dropped
          }),
          "P6766" -> (if (ck % 7 == 0) Seq(s"${100000000L + ck}") else Nil))
        val eqs = WdClaims.processEquivalents(claims)
        M4Out(ck, eqs.size.toLong, eqs.mkString(";"))
      }.toDF()
  }

  final case class M4bOut(id: Long, n_diffs: Long, diffs: String)

  /** M4b: the differentFrom expansion (base.py:84-109) — disambiguation
    * pages (P31 ∋ Q4167410, membership tested among OTHER types too)
    * expand their P1889 list pairwise in both directions; regular
    * records pair each value with the record id; value-less records
    * emit nothing. Rendered as ordered 'src|dst' CSV per record. */
  def wdDifferentFrom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val p1889 = (ck % 3) match {
          case 0 => Seq(s"Qa${ck % 20}", s"Qb${ck % 30}")
          case 1 => Seq(s"Qa${ck % 20}")
          case _ => Nil
        }
        val p31 =
          if (ck % 8 == 0) Seq("Q5", "Q4167410") // disambig among others
          else if (ck % 4 == 0) Seq("Q4167410")
          else Seq("Q5")
        val diffs = WdClaims.processDifferentFrom(s"Q$ck",
          Map("P1889" -> p1889, "P31" -> p31))
        M4bOut(ck, diffs.size.toLong,
          diffs.map { case (a, b) => s"$a|$b" }.mkString(";"))
      }.toDF()
  }
  private val wdDifferentFromOracle: String =
    """SELECT CAST(c_custkey AS BIGINT) AS id,
      |  CAST(CASE
      |    WHEN c_custkey % 3 = 2 THEN 0
      |    WHEN c_custkey % 4 = 0 THEN
      |      CASE WHEN c_custkey % 3 = 0 THEN 2 ELSE 0 END
      |    ELSE CASE WHEN c_custkey % 3 = 0 THEN 2 ELSE 1 END
      |  END AS BIGINT) AS n_diffs,
      |  CASE
      |    WHEN c_custkey % 3 = 2 THEN ''
      |    WHEN c_custkey % 4 = 0 THEN
      |      CASE WHEN c_custkey % 3 = 0 THEN
      |        'Qa' || (c_custkey % 20) || '|Qb' || (c_custkey % 30) || ';'
      |          || 'Qb' || (c_custkey % 30) || '|Qa' || (c_custkey % 20)
      |      ELSE '' END
      |    ELSE
      |      CASE WHEN c_custkey % 3 = 0 THEN
      |        'Qa' || (c_custkey % 20) || '|Q' || c_custkey || ';'
      |          || 'Qb' || (c_custkey % 30) || '|Q' || c_custkey
      |      ELSE 'Qa' || (c_custkey % 20) || '|Q' || c_custkey END
      |  END AS diffs
      |FROM customer""".stripMargin

  private val equivalentsOracle: String =
    """WITH e AS (
      |  SELECT c_custkey AS ck,
      |    list_filter([
      |      CASE WHEN c_custkey % 2 = 0
      |        THEN 'http://id.worldcat.org/fast/' || CAST(c_custkey % 1000 AS VARCHAR) END,
      |      CASE WHEN c_custkey % 3 = 0
      |        THEN 'http://vocab.getty.edu/aat/3000' || CAST(c_custkey % 100 AS VARCHAR) END,
      |      CASE WHEN c_custkey % 5 = 0
      |        THEN 'https://viaf.org/viaf/' || CAST(c_custkey % 500 AS VARCHAR) END,
      |      CASE WHEN c_custkey % 5 = 0
      |        THEN 'https://viaf.org/viaf/' || CAST(c_custkey % 500 + 1 AS VARCHAR) END,
      |      CASE WHEN c_custkey % 3 = 0
      |        THEN 'http://id.loc.gov/authorities/names/n' || CAST(c_custkey AS VARCHAR)
      |        WHEN c_custkey % 3 = 1
      |        THEN 'http://id.loc.gov/authorities/subjects/s' || CAST(c_custkey AS VARCHAR) END,
      |      CASE WHEN c_custkey % 7 = 0
      |        THEN 'https://data.whosonfirst.org/'
      |          || substr(CAST(100000000 + c_custkey AS VARCHAR), 1, 3) || '/'
      |          || substr(CAST(100000000 + c_custkey AS VARCHAR), 4, 3) || '/'
      |          || substr(CAST(100000000 + c_custkey AS VARCHAR), 7, 3) || '/'
      |          || CAST(100000000 + c_custkey AS VARCHAR) || '.geojson' END
      |    ], x -> x IS NOT NULL) AS segs
      |  FROM customer)
      |SELECT ck AS id, CAST(len(segs) AS BIGINT) AS n_eqs,
      |  COALESCE(array_to_string(segs, ';'), '') AS eqs
      |FROM e""".stripMargin

  final case class M5Out(id: Long, rtype: String, b_begin: String,
      b_end: String, b_display: String, b_place: String, d_begin: String,
      d_end: String, gender: String, nationality: String)

  /** M5 process_person + M2 guess_type in one map stage: precision-ranged
    * birth/death (incl. the clean_date -00 clamp on year-precision
    * dumps), 10-char display dates, first-birthplace rule, gender /
    * nationality lookup with unknown-drop, and the entity class from the
    * P31 table with property-vote fallback. */
  def person(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val y = 1800 + (ck % 150)
        val bprec = (ck % 3) match { case 0 => 9 case 1 => 10 case _ => 11 }
        val btime =
          if (bprec == 9) f"+$y%04d-00-00T00:00:00Z" else f"+$y%04d-03-15T00:00:00Z"
        val y2 = y + 20 + (ck % 50)
        val dprec = ((ck + 1) % 3) match { case 0 => 9 case 1 => 10 case _ => 11 }
        val death =
          if (ck % 4 != 0) Some(WdDate(f"+$y2%04d-03-15T00:00:00Z", dprec.toInt))
          else None
        val genders = Seq((ck % 4) match {
          case 0 => "Q6581072"
          case 1 => "Q6581097"
          case 2 => "Q2449503"
          case _ => "Q999999" // unknown: dropped
        })
        val nats = (ck % 5) match {
          case 0 => Seq("Q30")
          case 1 => Seq("Q142")
          case 2 => Seq("Q30", "Q183")
          case _ => Seq("Q1") // unknown: dropped
        }
        val bplace = if (ck % 2 == 0) Seq(s"Q${ck % 97}") else Nil
        val r = WdClaims.processPerson(Some(WdDate(btime, bprec.toInt)), death,
          bplace, Nil, genders, nats)
        val p31 = (ck % 6) match {
          case 0 => Seq("Q5")
          case 1 => Seq("Q515")
          case 2 => Seq("Q43229")
          case _ => Seq(s"QX$ck") // unknown (never a real QID): vote decides
        }
        val props = Seq("P569", "P106") ++ (if (death.isDefined) Seq("P570") else Nil)
        M5Out(ck, WdTypes.guessType(p31, props).orNull,
          r.born.map(_.begin).orNull, r.born.map(_.end).orNull,
          r.born.map(_.display).orNull, r.born.flatMap(_.place).orNull,
          r.died.map(_.begin).orNull, r.died.map(_.end).orNull,
          Option(r.genders.mkString(",")).filter(_.nonEmpty).orNull,
          Option(r.nationalities.mkString(",")).filter(_.nonEmpty).orNull)
      }.toDF()
  }

  private val personOracle: String =
    """WITH p AS (
      |  SELECT c_custkey AS ck,
      |    1800 + (c_custkey % 150) AS y,
      |    1800 + (c_custkey % 150) + 20 + (c_custkey % 50) AS y2,
      |    c_custkey % 3 AS bp, (c_custkey + 1) % 3 AS dp
      |  FROM customer)
      |SELECT ck AS id,
      |  CASE WHEN ck % 6 = 0 THEN 'Person' WHEN ck % 6 = 1 THEN 'Place'
      |    WHEN ck % 6 = 2 THEN 'Group' ELSE 'Person' END AS rtype,
      |  CASE bp WHEN 0 THEN CAST(y AS VARCHAR) || '-01-01T00:00:00'
      |    WHEN 1 THEN CAST(y AS VARCHAR) || '-03-01T00:00:00'
      |    ELSE CAST(y AS VARCHAR) || '-03-15T00:00:00' END AS b_begin,
      |  CASE bp WHEN 0 THEN CAST(y AS VARCHAR) || '-12-31T23:59:59'
      |    WHEN 1 THEN CAST(y AS VARCHAR) || '-03-31T23:59:59'
      |    ELSE CAST(y AS VARCHAR) || '-03-15T23:59:59' END AS b_end,
      |  CASE bp WHEN 0 THEN CAST(y AS VARCHAR) || '-01-01'
      |    ELSE CAST(y AS VARCHAR) || '-03-15' END AS b_display,
      |  CASE WHEN ck % 2 = 0
      |    THEN 'http://www.wikidata.org/entity/Q' || CAST(ck % 97 AS VARCHAR)
      |  END AS b_place,
      |  CASE WHEN ck % 4 = 0 THEN NULL
      |    WHEN dp = 0 THEN CAST(y2 AS VARCHAR) || '-01-01T00:00:00'
      |    WHEN dp = 1 THEN CAST(y2 AS VARCHAR) || '-03-01T00:00:00'
      |    ELSE CAST(y2 AS VARCHAR) || '-03-15T00:00:00' END AS d_begin,
      |  CASE WHEN ck % 4 = 0 THEN NULL
      |    WHEN dp = 0 THEN CAST(y2 AS VARCHAR) || '-12-31T23:59:59'
      |    WHEN dp = 1 THEN CAST(y2 AS VARCHAR) || '-03-31T23:59:59'
      |    ELSE CAST(y2 AS VARCHAR) || '-03-15T23:59:59' END AS d_end,
      |  CASE ck % 4 WHEN 0 THEN 'female' WHEN 1 THEN 'male'
      |    WHEN 2 THEN 'transgender' END AS gender,
      |  CASE ck % 5 WHEN 0 THEN 'http://vocab.getty.edu/aat/300107956'
      |    WHEN 1 THEN 'http://vocab.getty.edu/aat/300111188'
      |    WHEN 2 THEN 'http://vocab.getty.edu/aat/300107956,http://vocab.getty.edu/aat/300111192'
      |  END AS nationality
      |FROM p""".stripMargin

  final case class M5GroupOut(id: Long, member_of: String, f_begin: String,
      f_end: String, f_display: String, f_place: String, founders: String,
      d_begin: String, d_end: String, address: String)

  /** M5 process_group (wikidata/mapper.py:661-742): formation/dissolution
    * events with precision-ranged timespans, P740 formation place,
    * founders kept only when the reference resolves to Person/Group
    * (fixture class = qid number % 4: 0=Person 1=Group 2=Place 3=Type),
    * P749 parents, P6375 street address. */
  def group(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val refClass: String => Option[String] = q => {
      val n = q.drop(1).toLong
      Some(Seq("Person", "Group", "Place", "Type")((n % 4).toInt))
    }
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val y = 1700 + (ck % 200)
        val fprec = (ck % 3) match { case 0 => 9 case 1 => 10 case _ => 11 }
        val ftime =
          if (fprec == 9) f"+$y%04d-00-00T00:00:00Z" else f"+$y%04d-03-15T00:00:00Z"
        val formation =
          if (ck % 4 != 3) Some(WdDate(ftime, fprec.toInt)) else None
        val fplace = if (ck % 2 == 0) Seq(s"Q${ck % 77}") else Nil
        val parents = (ck % 3) match {
          case 0 => Seq(s"Q${ck % 50}")
          case 1 => Seq(s"Q${ck % 50}", s"Q${ck % 50 + 1}")
          case _ => Nil
        }
        val founders = Seq(s"Q$ck", s"Q${ck + 1}", s"Q${ck + 2}")
        val dissolution =
          if (ck % 5 == 0) Some(WdDate(f"+${y + (ck % 80) + 1}%04d-03-15T00:00:00Z", 11))
          else None
        val address = if (ck % 7 == 0) Some(s"$ck Main St") else None
        val r = WdClaims.processGroup(formation, dissolution, fplace, parents,
          founders, address, refClass)
        M5GroupOut(ck, r.memberOf.mkString(";"),
          r.formed.map(_.begin).orNull, r.formed.map(_.end).orNull,
          r.formed.map(_.display).orNull, r.formed.flatMap(_.place).orNull,
          r.founders.mkString(";"),
          r.dissolved.map(_.begin).orNull, r.dissolved.map(_.end).orNull,
          r.address.orNull)
      }.toDF()
  }

  private def wd(expr: String): String =
    s"'http://www.wikidata.org/entity/Q' || CAST($expr AS VARCHAR)"

  private val groupOracle: String =
    s"""WITH p AS (
      |  SELECT c_custkey AS ck, 1700 + (c_custkey % 200) AS y,
      |    c_custkey % 3 AS fp
      |  FROM customer)
      |SELECT ck AS id,
      |  CASE ck % 3 WHEN 0 THEN ${wd("ck % 50")}
      |    WHEN 1 THEN ${wd("ck % 50")} || ';' || ${wd("ck % 50 + 1")}
      |    ELSE '' END AS member_of,
      |  CASE WHEN ck % 4 = 3 THEN NULL
      |    WHEN fp = 0 THEN CAST(y AS VARCHAR) || '-01-01T00:00:00'
      |    WHEN fp = 1 THEN CAST(y AS VARCHAR) || '-03-01T00:00:00'
      |    ELSE CAST(y AS VARCHAR) || '-03-15T00:00:00' END AS f_begin,
      |  CASE WHEN ck % 4 = 3 THEN NULL
      |    WHEN fp = 0 THEN CAST(y AS VARCHAR) || '-12-31T23:59:59'
      |    WHEN fp = 1 THEN CAST(y AS VARCHAR) || '-03-31T23:59:59'
      |    ELSE CAST(y AS VARCHAR) || '-03-15T23:59:59' END AS f_end,
      |  CASE WHEN ck % 4 = 3 THEN NULL
      |    WHEN fp = 0 THEN CAST(y AS VARCHAR) || '-01-01'
      |    ELSE CAST(y AS VARCHAR) || '-03-15' END AS f_display,
      |  CASE WHEN ck % 2 = 0 AND ck % 4 <> 3 THEN ${wd("ck % 77")} END AS f_place,
      |  CASE ck % 4
      |    WHEN 0 THEN ${wd("ck")} || ';' || ${wd("ck + 1")}
      |    WHEN 1 THEN ${wd("ck")}
      |    WHEN 2 THEN ${wd("ck + 2")}
      |    ELSE ${wd("ck + 1")} || ';' || ${wd("ck + 2")} END AS founders,
      |  CASE WHEN ck % 5 = 0
      |    THEN CAST(y + (ck % 80) + 1 AS VARCHAR) || '-03-15T00:00:00' END AS d_begin,
      |  CASE WHEN ck % 5 = 0
      |    THEN CAST(y + (ck % 80) + 1 AS VARCHAR) || '-03-15T23:59:59' END AS d_end,
      |  CASE WHEN ck % 7 = 0 THEN CAST(ck AS VARCHAR) || ' Main St' END AS address
      |FROM p""".stripMargin

  final case class M5PlaceOut(id: Long, cls: String, part_of: String,
      defined_by: String)

  /** M5 process_place (wikidata/mapper.py:744-827): the P31→AAT map in
    * dict order, broader P361+P131-else-P17 filtered to Place refs
    * (fixture class: even qid number = Place), and defined_by — extreme
    * points → NW..SW box WKT with the shoelace-area>2000 reject, falling
    * back to the P625 point. */
  def place(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.pipeline.WdClaims.WdCoord
    val refClass: String => Option[String] = q =>
      Some(if (q.drop(1).toLong % 2 == 0) "Place" else "Person")
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val types = (ck % 7) match {
          case 0 => Seq("Q6256")
          case 1 => Seq("Q515")
          case 2 => Seq("Q0", "Q35657") // unmapped first: map order decides
          case 3 => Seq("Q106458883")
          case 4 => Seq("Q5107")
          case 5 => Seq("Q515", "Q6256") // both present: country (map order) wins
          case _ => Seq("Q1")
        }
        val p361 = if (ck % 3 == 0) Seq(s"Q${3 * ck}") else Nil
        val p131 = if (ck % 3 <= 1) Seq(s"Q${3 * ck + 1}") else Nil
        val p17 = Seq(s"Q${3 * ck + 2}")
        val (n, s, e, w) =
          if (ck % 3 == 0) {
            val nLat = (ck % 60).toDouble + 0.5
            val sLat = nLat - ((ck % 7) + 1) * 5
            val wLon = (ck % 80).toDouble
            val eLon = wLon + ((ck % 9) + 1) * 10
            (Some(WdCoord(0, nLat)), Some(WdCoord(0, sLat)),
              Some(WdCoord(eLon, 0)), Some(WdCoord(wLon, 0)))
          } else (None, None, None, None)
        val point =
          if (ck % 2 == 0)
            Some(WdCoord((ck % 360).toDouble - 179.5, (ck % 180).toDouble - 89.5))
          else None
        val r = WdClaims.processPlace(types, p361, p131, p17, n, s, e, w,
          point, refClass)
        M5PlaceOut(ck, r.classifiedAs.orNull, r.partOf.mkString(";"),
          r.definedBy.orNull)
      }.toDF()
  }

  private val placeOracle: String = {
    // the shoelace area of the fixture box is width*height; the box is
    // kept only at area <= 2000
    val width = "((ck % 9) + 1) * 10"
    val height = "((ck % 7) + 1) * 5"
    def f(expr: String) = s"CAST(CAST($expr AS DOUBLE) AS VARCHAR)"
    val nLat = f("(ck % 60) + 0.5")
    val sLat = f("((ck % 60) + 0.5) - ((ck % 7) + 1) * 5")
    val wLon = f("ck % 80")
    val eLon = f("(ck % 80) + ((ck % 9) + 1) * 10")
    s"""WITH p AS (SELECT c_custkey AS ck FROM customer)
      |SELECT ck AS id,
      |  CASE ck % 7
      |    WHEN 0 THEN 'http://vocab.getty.edu/aat/300128207'
      |    WHEN 1 THEN 'http://vocab.getty.edu/aat/300008389'
      |    WHEN 2 THEN 'http://vocab.getty.edu/aat/300000776'
      |    WHEN 3 THEN 'http://vocab.getty.edu/aat/300000776'
      |    WHEN 4 THEN 'http://vocab.getty.edu/aat/300128176'
      |    WHEN 5 THEN 'http://vocab.getty.edu/aat/300128207'
      |  END AS cls,
      |  CASE WHEN ck % 3 = 0 THEN
      |      CASE WHEN (3 * ck) % 2 = 0 AND (3 * ck + 1) % 2 = 0
      |          THEN ${wd("3 * ck")} || ';' || ${wd("3 * ck + 1")}
      |        WHEN (3 * ck) % 2 = 0 THEN ${wd("3 * ck")}
      |        WHEN (3 * ck + 1) % 2 = 0 THEN ${wd("3 * ck + 1")}
      |        ELSE '' END
      |    WHEN ck % 3 = 1 THEN
      |      CASE WHEN (3 * ck + 1) % 2 = 0 THEN ${wd("3 * ck + 1")} ELSE '' END
      |    ELSE
      |      CASE WHEN (3 * ck + 2) % 2 = 0 THEN ${wd("3 * ck + 2")} ELSE '' END
      |  END AS part_of,
      |  CASE WHEN ck % 3 = 0 AND $width * $height <= 2000 THEN
      |      'POLYGON (( ' || $wLon || ' ' || $nLat || ',' || $eLon || ' ' || $nLat
      |        || ',' || $eLon || ' ' || $sLat || ',' || $wLon || ' ' || $sLat
      |        || ',' || $wLon || ' ' || $nLat || ' ))'
      |    WHEN ck % 2 = 0 THEN
      |      'POINT ( ' || ${f("(ck % 360) - 179.5")} || ' '
      |        || ${f("(ck % 180) - 89.5")} || ' )'
      |  END AS defined_by
      |FROM p""".stripMargin
  }

  final case class M5HmoOut(id: Long, cls: String, p_begin: String,
      p_end: String, creators: String, p_places: String, cats: String,
      accs: String, mats: String, dims: String, e_begin: String,
      e_end: String, e_places: String)

  /** M5 process_humanmadeobject (wikidata/mapper.py:890-1032): P31→AAT,
    * production (P571 + P170-else-P176 creators filtered to Person/Group
    * — fixture class = qid number % 3: 0=Person 1=Group 2=Place — +
    * P1071 places), P528/P217 identifiers, P186 materials, first-claim
    * dimensions with '+'-strip and cm/inch unit mapping, P189/P575
    * encounter. */
  def hmo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val refClass: String => Option[String] = q => {
      val n = q.drop(1).toLong
      Some(Seq("Person", "Group", "Place")((n % 3).toInt))
    }
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val types = (ck % 5) match {
          case 0 => Seq("Q3305213")
          case 1 => Seq("Q860861")
          case 2 => Seq("Q93184")
          case 3 => Seq("Q125191")
          case _ => Seq("Q42")
        }
        val y = 1400 + (ck % 600)
        val prodDate =
          if (ck % 3 != 0) Some(WdDate(f"+$y%04d-06-10T00:00:00Z", 11)) else None
        val p170 = if (ck % 4 == 0) Seq(s"Q${2 * ck}", s"Q${2 * ck + 1}") else Nil
        val p176 = if (ck % 4 <= 1) Seq(s"Q${2 * ck + 2}") else Nil
        val prodPlaces = if (ck % 6 == 0) Seq(s"Q${ck % 13}") else Nil
        val cats = if (ck % 2 == 0) Seq(s"cat${ck % 40}") else Nil
        val accs = if (ck % 3 == 0) Seq(s"acc$ck") else Nil
        val mats = (ck % 3) match {
          case 0 => Seq(s"Q${ck % 20}")
          case 1 => Seq(s"Q${ck % 20}", s"Q${ck % 20 + 1}")
          case _ => Nil
        }
        val width =
          if (ck % 2 == 0) Some((s"+${ck % 90}.5", "Q174728")) else None
        val height =
          if (ck % 3 == 0) Some((s"${ck % 50}.5", "Q218593")) else None
        val depth =
          if (ck % 5 == 0) Some((s"+${ck % 30}.5", s"Q${ck % 11}")) else None
        val encPlaces = if (ck % 7 == 0) Seq(s"Q${ck % 17}") else Nil
        val y3 = 1900 + (ck % 100)
        val encDate =
          if (ck % 8 == 0) Some(WdDate(f"+$y3%04d-05-15T00:00:00Z", 10)) else None
        val r = WdClaims.processHmo(types, prodDate, p170, p176, prodPlaces,
          cats, accs, mats, width, height, depth, encPlaces, encDate, refClass)
        M5HmoOut(ck, r.classifiedAs.orNull,
          r.production.map(_.begin).orNull, r.production.map(_.end).orNull,
          r.creators.mkString(";"), r.prodPlaces.mkString(";"),
          r.catalogIds.mkString(";"), r.accessionNumbers.mkString(";"),
          r.materials.mkString(";"),
          r.dimensions.map(d => s"${d.kind}:${d.value}:${d.unit}").mkString(";"),
          r.encounter.map(_.begin).orNull, r.encounter.map(_.end).orNull,
          r.encounterPlaces.mkString(";"))
      }.toDF()
  }

  private val hmoOracle: String = {
    def f(expr: String) = s"CAST(CAST($expr AS DOUBLE) AS VARCHAR)"
    val cm = "http://vocab.getty.edu/aat/300379098"
    val in = "http://vocab.getty.edu/aat/300379100"
    s"""WITH p AS (
      |  SELECT c_custkey AS ck, 1400 + (c_custkey % 600) AS y,
      |    1900 + (c_custkey % 100) AS y3
      |  FROM customer)
      |SELECT ck AS id,
      |  CASE ck % 5
      |    WHEN 0 THEN 'http://vocab.getty.edu/aat/300033618'
      |    WHEN 1 THEN 'http://vocab.getty.edu/aat/300047090'
      |    WHEN 2 THEN 'http://vocab.getty.edu/aat/300033973'
      |    WHEN 3 THEN 'http://vocab.getty.edu/aat/300046300'
      |  END AS cls,
      |  CASE WHEN ck % 3 <> 0
      |    THEN CAST(y AS VARCHAR) || '-06-10T00:00:00' END AS p_begin,
      |  CASE WHEN ck % 3 <> 0
      |    THEN CAST(y AS VARCHAR) || '-06-10T23:59:59' END AS p_end,
      |  CASE WHEN ck % 4 = 0 THEN
      |      CASE (2 * ck) % 3
      |        WHEN 0 THEN ${wd("2 * ck")} || ';' || ${wd("2 * ck + 1")}
      |        WHEN 1 THEN ${wd("2 * ck")}
      |        ELSE ${wd("2 * ck + 1")} END
      |    WHEN ck % 4 = 1 THEN
      |      CASE WHEN (2 * ck + 2) % 3 <= 1 THEN ${wd("2 * ck + 2")} ELSE '' END
      |    ELSE '' END AS creators,
      |  CASE WHEN ck % 6 = 0 THEN ${wd("ck % 13")} ELSE '' END AS p_places,
      |  CASE WHEN ck % 2 = 0 THEN 'cat' || CAST(ck % 40 AS VARCHAR) ELSE '' END AS cats,
      |  CASE WHEN ck % 3 = 0 THEN 'acc' || CAST(ck AS VARCHAR) ELSE '' END AS accs,
      |  CASE ck % 3 WHEN 0 THEN ${wd("ck % 20")}
      |    WHEN 1 THEN ${wd("ck % 20")} || ';' || ${wd("ck % 20 + 1")}
      |    ELSE '' END AS mats,
      |  COALESCE(array_to_string(list_filter([
      |    CASE WHEN ck % 2 = 0
      |      THEN 'width:' || ${f("(ck % 90) + 0.5")} || ':$cm' END,
      |    CASE WHEN ck % 3 = 0
      |      THEN 'height:' || ${f("(ck % 50) + 0.5")} || ':$in' END,
      |    CASE WHEN ck % 5 = 0
      |      THEN 'depth:' || ${f("(ck % 30) + 0.5")}
      |        || ':http://www.wikidata.org/entity/Q' || CAST(ck % 11 AS VARCHAR) END
      |  ], x -> x IS NOT NULL), ';'), '') AS dims,
      |  CASE WHEN ck % 8 = 0
      |    THEN CAST(y3 AS VARCHAR) || '-05-01T00:00:00' END AS e_begin,
      |  CASE WHEN ck % 8 = 0
      |    THEN CAST(y3 AS VARCHAR) || '-05-31T23:59:59' END AS e_end,
      |  CASE WHEN ck % 7 = 0 THEN ${wd("ck % 17")} ELSE '' END AS e_places
      |FROM p""".stripMargin
  }

  /** Fixture reference resolver for the work/event queries: qid number
    * % 5 → Person/Group/Place/Type, 4 = unresolvable (get_reference
    * returned None). */
  private def cls5(q: String): Option[String] = {
    val n = q.drop(1).toLong
    if (n % 5 == 4) None
    else Some(Seq("Person", "Group", "Place", "Type")((n % 5).toInt))
  }

  final case class M5WorkOut(id: Long, genres: String, movements: String,
      about: String, c_begin: String, c_end: String, c_display: String,
      creators: String, c_places: String, p_begin: String, p_end: String,
      publishers: String, p_places: String, depicts: String, langs: String)

  /** M5 process_work + visualitem/linguisticobject wrappers
    * (wikidata/mapper.py:1034-1121): genres/movements, about with
    * resolvability filtering, Creation and Publishing events with
    * Person/Group agent filtering, depicts, languages. */
  def work(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val genres = if (ck % 3 == 0) Seq(s"Q${ck % 25}", s"Q${ck % 25 + 1}") else Nil
        val movements = if (ck % 4 == 0) Seq(s"Q${ck % 15}") else Nil
        val subjects = if (ck % 2 == 0) Seq(s"Q$ck", s"Q${ck + 1}") else Nil
        val authors = if (ck % 3 != 0) Seq(s"Q${3 * ck}", s"Q${3 * ck + 1}") else Nil
        val crePlaces = if (ck % 6 == 0) Seq(s"Q${ck % 19}") else Nil
        val y = 1500 + (ck % 500)
        val creDate = if (ck % 4 != 0) Some(WdDate(f"+$y%04d-00-00T00:00:00Z", 9)) else None
        val publishers = if (ck % 5 == 0) Seq(s"Q${7 * ck}") else Nil
        val pubPlaces = if (ck % 7 == 0) Seq(s"Q${ck % 23}") else Nil
        val y2 = 1900 + (ck % 120)
        val pubDate = if (ck % 2 == 1) Some(WdDate(f"+$y2%04d-09-05T00:00:00Z", 11)) else None
        val depicts = if (ck % 4 == 2) Seq(s"Q${ck + 5}") else Nil
        val langs = if (ck % 8 == 0) Seq(s"Q${ck % 12}") else Nil
        val r = WdClaims.processWork(genres, subjects, movements, authors,
          crePlaces, creDate, publishers, pubPlaces, pubDate, depicts, langs, cls5)
        M5WorkOut(ck, r.genres.mkString(";"), r.movements.mkString(";"),
          r.about.mkString(";"),
          r.creation.map(_.begin).orNull, r.creation.map(_.end).orNull,
          r.creation.map(_.display).orNull,
          r.creators.mkString(";"), r.creationPlaces.mkString(";"),
          r.publishing.map(_.begin).orNull, r.publishing.map(_.end).orNull,
          r.publishers.mkString(";"), r.pubPlaces.mkString(";"),
          r.represents.mkString(";"), r.languages.mkString(";"))
      }.toDF()
  }

  private val workOracle: String =
    s"""WITH p AS (
      |  SELECT c_custkey AS ck, 1500 + (c_custkey % 500) AS y,
      |    1900 + (c_custkey % 120) AS y2
      |  FROM customer)
      |SELECT ck AS id,
      |  CASE WHEN ck % 3 = 0
      |    THEN ${wd("ck % 25")} || ';' || ${wd("ck % 25 + 1")} ELSE '' END AS genres,
      |  CASE WHEN ck % 4 = 0 THEN ${wd("ck % 15")} ELSE '' END AS movements,
      |  CASE WHEN ck % 2 = 0 THEN
      |      CASE WHEN ck % 5 <> 4 AND (ck + 1) % 5 <> 4
      |          THEN ${wd("ck")} || ';' || ${wd("ck + 1")}
      |        WHEN ck % 5 <> 4 THEN ${wd("ck")}
      |        WHEN (ck + 1) % 5 <> 4 THEN ${wd("ck + 1")}
      |        ELSE '' END
      |    ELSE '' END AS about,
      |  CASE WHEN ck % 4 <> 0
      |    THEN CAST(y AS VARCHAR) || '-01-01T00:00:00' END AS c_begin,
      |  CASE WHEN ck % 4 <> 0
      |    THEN CAST(y AS VARCHAR) || '-12-31T23:59:59' END AS c_end,
      |  CASE WHEN ck % 4 <> 0
      |    THEN CAST(y AS VARCHAR) || '-01-01' END AS c_display,
      |  CASE WHEN ck % 3 <> 0 THEN
      |      CASE WHEN (3 * ck) % 5 <= 1 AND (3 * ck + 1) % 5 <= 1
      |          THEN ${wd("3 * ck")} || ';' || ${wd("3 * ck + 1")}
      |        WHEN (3 * ck) % 5 <= 1 THEN ${wd("3 * ck")}
      |        WHEN (3 * ck + 1) % 5 <= 1 THEN ${wd("3 * ck + 1")}
      |        ELSE '' END
      |    ELSE '' END AS creators,
      |  CASE WHEN ck % 6 = 0 THEN ${wd("ck % 19")} ELSE '' END AS c_places,
      |  CASE WHEN ck % 2 = 1
      |    THEN CAST(y2 AS VARCHAR) || '-09-05T00:00:00' END AS p_begin,
      |  CASE WHEN ck % 2 = 1
      |    THEN CAST(y2 AS VARCHAR) || '-09-05T23:59:59' END AS p_end,
      |  CASE WHEN ck % 5 = 0 AND (7 * ck) % 5 <= 1
      |    THEN ${wd("7 * ck")} ELSE '' END AS publishers,
      |  CASE WHEN ck % 7 = 0 THEN ${wd("ck % 23")} ELSE '' END AS p_places,
      |  CASE WHEN ck % 4 = 2 AND (ck + 5) % 5 <> 4
      |    THEN ${wd("ck + 5")} ELSE '' END AS depicts,
      |  CASE WHEN ck % 8 = 0 THEN ${wd("ck % 12")} ELSE '' END AS langs
      |FROM p""".stripMargin

  final case class M5EventOut(id: Long, bb: String, eb: String, be: String,
      ee: String, places: String, participants: String, part_of: String)

  /** M5 process_activity/process_event (wikidata/mapper.py:1123-1186):
    * four-point timespan, P17+P276+P2293 places in claim order,
    * P710+P488 participants filtered to Person/Group, P361 broader. */
  def event(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val ya = 1800 + (ck % 100)
        val yb = ya + (ck % 30)
        val start = if (ck % 3 != 0) Some(WdDate(f"+$ya%04d-00-00T00:00:00Z", 9)) else None
        val end = if (ck % 4 != 0) Some(WdDate(f"+$yb%04d-06-20T00:00:00Z", 11)) else None
        val countries = if (ck % 2 == 0) Seq(s"Q${ck % 31}") else Nil
        val locations = if (ck % 3 == 0) Seq(s"Q${ck % 37}") else Nil
        val venues = if (ck % 5 == 0) Seq(s"Q${ck % 41}") else Nil
        val parts = if (ck % 2 == 1) Seq(s"Q${2 * ck}") else Nil
        val chairs = if (ck % 6 == 0) Seq(s"Q${2 * ck + 1}") else Nil
        val broader = if (ck % 7 == 0) Seq(s"Q${ck % 29}", s"Q${ck % 29 + 1}") else Nil
        val r = WdClaims.processEvent(start, end, countries, locations, venues,
          parts, chairs, broader, cls5)
        M5EventOut(ck, r.beginBegin, r.endBegin, r.beginEnd, r.endEnd,
          r.places.mkString(";"), r.participants.mkString(";"),
          r.partOf.mkString(";"))
      }.toDF()
  }

  private val eventOracle: String =
    s"""WITH p AS (
      |  SELECT c_custkey AS ck, 1800 + (c_custkey % 100) AS ya,
      |    1800 + (c_custkey % 100) + (c_custkey % 30) AS yb
      |  FROM customer)
      |SELECT ck AS id,
      |  CASE WHEN ck % 3 <> 0 THEN CAST(ya AS VARCHAR) || '-01-01T00:00:00' END AS bb,
      |  CASE WHEN ck % 3 <> 0 THEN CAST(ya AS VARCHAR) || '-12-31T23:59:59' END AS eb,
      |  CASE WHEN ck % 4 <> 0 THEN CAST(yb AS VARCHAR) || '-06-20T00:00:00' END AS be,
      |  CASE WHEN ck % 4 <> 0 THEN CAST(yb AS VARCHAR) || '-06-20T23:59:59' END AS ee,
      |  COALESCE(array_to_string(list_filter([
      |    CASE WHEN ck % 2 = 0 THEN ${wd("ck % 31")} END,
      |    CASE WHEN ck % 3 = 0 THEN ${wd("ck % 37")} END,
      |    CASE WHEN ck % 5 = 0 THEN ${wd("ck % 41")} END
      |  ], x -> x IS NOT NULL), ';'), '') AS places,
      |  COALESCE(array_to_string(list_filter([
      |    CASE WHEN ck % 2 = 1 AND (2 * ck) % 5 <= 1 THEN ${wd("2 * ck")} END,
      |    CASE WHEN ck % 6 = 0 AND (2 * ck + 1) % 5 <= 1 THEN ${wd("2 * ck + 1")} END
      |  ], x -> x IS NOT NULL), ';'), '') AS participants,
      |  CASE WHEN ck % 7 = 0
      |    THEN ${wd("ck % 29")} || ';' || ${wd("ck % 29 + 1")} ELSE '' END AS part_of
      |FROM p""".stripMargin

  /** M5 process_concept identifier codes (wikidata/mapper.py:832-867). */
  def concept(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val ids = WdClaims.processConcept(
          p246 = if (ck % 2 == 0) Seq(s"Fe$ck") else Nil,
          p274 = if (ck % 3 == 0) Seq(s"H2O$ck") else Nil,
          p218 = if (ck % 4 == 0) Seq("aa") else Nil,
          p219 = if (ck % 5 == 0) Seq(s"eng$ck") else Nil,
          p220 = if (ck % 7 == 0) Seq(s"deu$ck") else Nil)
        (ck, ids.mkString(";"))
      }.toDF("id", "idents")
  }

  private val conceptOracle: String =
    """SELECT c_custkey AS id,
      |  COALESCE(array_to_string(list_filter([
      |    CASE WHEN c_custkey % 2 = 0 THEN 'Fe' || c_custkey
      |      WHEN c_custkey % 3 = 0 THEN 'H2O' || c_custkey END,
      |    CASE WHEN c_custkey % 4 = 0 THEN 'aa' END,
      |    CASE WHEN c_custkey % 5 = 0 THEN 'eng' || c_custkey
      |      WHEN c_custkey % 7 = 0 THEN 'deu' || c_custkey END
      |  ], x -> x IS NOT NULL), ';'), '') AS idents
      |FROM customer""".stripMargin

  final case class Vote(rec: Long, key: String, qid: String, truth: String)

  /** J3: the voting reconciler — 8 fixture variants exercise every
    * decision path: unanimity, truth confirm/veto, two-way strip,
    * one-qid-with-majority (rule 1), viaf/geonames noise strip (rule 2),
    * and the 2:1 count majority (rule 3). One shuffle on rec, decision
    * map-side via groupByKey+mapGroups (the §2.11 typed-fold shape). */
  def vote(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val votes = Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].flatMap { ck =>
        val x = ck % 50
        val (qa, qb, qc) = (s"Q$x", s"Q${x + 50}", s"Q${x + 100}")
        def v(key: String, q: String, truth: String = null) = Vote(ck, key, q, truth)
        (ck % 8) match {
          case 0 => Seq(v(s"aat:a$ck", qa), v(s"lcnaf:n$ck", qa))
          case 1 => Seq(v(s"aat:a$ck", qa, truth = qa))
          case 2 => Seq(v(s"aat:a$ck", qa, truth = qb))
          case 3 => Seq(v(s"aat:a$ck", qa), v(s"lcnaf:n$ck", qb))
          case 4 => Seq(v(s"aat:a$ck", qa), v(s"lcnaf:n$ck", qa), v(s"viaf:$ck", qb))
          case 5 => Seq(v(s"aat:a$ck", qa), v(s"viaf:$ck", qb), v(s"geonames:$ck", qc))
          case 6 => Seq(v(s"aat:a$ck", qa), v(s"viaf:$ck", qb))
          case _ => Seq(v(s"aat:a$ck", qa), v(s"ulan:u$ck", qa),
            v(s"lcnaf:n$ck", qa), v(s"tgn:t$ck", qb), v(s"japan:j$ck", qc))
        }
      }
    votes.groupByKey(_.rec).mapGroups { (rec, it) =>
      val vs = it.toSeq
      val truth = vs.flatMap(v => Option(v.truth)).headOption
      (rec, WdReconcile.decide(vs.map(v => (v.key, v.qid)), truth).orNull)
    }.toDF("rec", "qid")
  }

  private val voteOracle: String =
    """SELECT c_custkey AS rec,
      |  CASE WHEN c_custkey % 8 IN (0, 1, 4, 5, 6, 7)
      |    THEN 'Q' || (c_custkey % 50) END AS qid
      |FROM customer""".stripMargin

  /** M2 guess_type (`wikidata/mapper.py:121-295`): P31 lookup first hit
    * wins; otherwise the weighted property vote with max total weight,
    * ties broken by class name ascending. The fixture exercises the
    * lookup path (direct + later-position hit), the junk-P31 fallthrough
    * to voting, every tie-break in the vote table, and the no-signal
    * null. The oracle replays the vote as per-class weight columns +
    * argmax window — the LOGIC, not the answers. */
  def guessType(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val p31 = (ck % 5) match {
          case 0 => Seq("Q5")
          case 1 => Seq("QX", "Q515") // later-position lookup hit
          case 2 => Seq("QJUNK")      // no lookup hit -> vote path
          case _ => Nil
        }
        val props = (ck % 8) match {
          case 0 => Seq("P569", "P106") // Person 5
          case 1 => Seq("P625")         // Place 3
          case 2 => Seq("P571", "P186") // HMO 2 beats Group/Material 1
          case 3 => Seq("P571")         // Group/HMO tie -> Group (name asc)
          case 4 => Seq("P2079")        // Type/Material tie -> Material
          case 5 => Seq("P170", "P407") // HMO/LinguisticObject tie -> HMO
          case 6 => Seq("P50", "P279")  // LinguisticObject/Type tie -> LO
          case _ => Nil                 // no signal -> null
        }
        (ck, WdTypes.guessType(p31, props).orNull)
      }.toDF("ident", "cls")
  }
  private val guessTypeOracle: String =
    """WITH v AS (
      |  SELECT c_custkey AS ck, c_custkey % 5 AS a, c_custkey % 8 AS p
      |  FROM customer),
      |scores AS (
      |  SELECT ck, 'Person' AS cls, CASE p WHEN 0 THEN 5 ELSE 0 END AS w FROM v
      |  UNION ALL SELECT ck, 'Place', CASE p WHEN 1 THEN 3 ELSE 0 END FROM v
      |  UNION ALL SELECT ck, 'Group', CASE p WHEN 2 THEN 1 WHEN 3 THEN 1 ELSE 0 END FROM v
      |  UNION ALL SELECT ck, 'HumanMadeObject',
      |    CASE p WHEN 2 THEN 2 WHEN 3 THEN 1 WHEN 5 THEN 2 ELSE 0 END FROM v
      |  UNION ALL SELECT ck, 'Material', CASE p WHEN 2 THEN 1 WHEN 4 THEN 1 ELSE 0 END FROM v
      |  UNION ALL SELECT ck, 'Type', CASE p WHEN 4 THEN 1 WHEN 6 THEN 2 ELSE 0 END FROM v
      |  UNION ALL SELECT ck, 'VisualItem', CASE p WHEN 5 THEN 1 ELSE 0 END FROM v
      |  UNION ALL SELECT ck, 'LinguisticObject',
      |    CASE p WHEN 5 THEN 2 WHEN 6 THEN 2 ELSE 0 END FROM v),
      |best AS (
      |  SELECT ck, cls,
      |    ROW_NUMBER() OVER (PARTITION BY ck ORDER BY w DESC, cls ASC) AS rn
      |  FROM scores WHERE w > 0)
      |SELECT v.ck AS ident,
      |  CASE WHEN v.a = 0 THEN 'Person'
      |       WHEN v.a = 1 THEN 'Place'
      |       ELSE b.cls END AS cls
      |FROM v LEFT JOIN best b ON b.ck = v.ck AND b.rn = 1""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("m2_guess_type", guessType, Some(guessTypeOracle)))
    Queries.register(QueryDef("m3_labels", labels, Some(labelsOracle)))
    Queries.register(QueryDef("m4_equivalents", equivalents, Some(equivalentsOracle)))
    Queries.register(QueryDef("m4b_wd_different_from", wdDifferentFrom, Some(wdDifferentFromOracle)))
    Queries.register(QueryDef("m5_person", person, Some(personOracle)))
    Queries.register(QueryDef("m5_group", group, Some(groupOracle)))
    Queries.register(QueryDef("m5_place", place, Some(placeOracle)))
    Queries.register(QueryDef("m5_hmo", hmo, Some(hmoOracle)))
    Queries.register(QueryDef("m5_work", work, Some(workOracle)))
    Queries.register(QueryDef("m5_event", event, Some(eventOracle)))
    Queries.register(QueryDef("m5_concept", concept, Some(conceptOracle)))
    Queries.register(QueryDef("j3_vote", vote, Some(voteOracle)))
  }
}
