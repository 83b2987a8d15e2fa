package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-merge operators (SURVEY §2.5): the typed Aggregator fold over
  * groupByKey(cluster) — customers play the role of YUID clusters, their
  * orders the role of source records, (o_orderdate, o_orderkey) the role
  * of merge_order. */
object MergeQueries extends QueryGroup {
  import operators.RecordMerge

  /** A1: order-sensitive merge fold as an associative+commutative typed
    * Aggregator — one partial-agg shuffle, no sort/collect_list. */
  def mergeFold(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recs = Tables.load(spark, dir, "orders")
      .select($"o_custkey".as("cluster"), $"o_orderkey".as("orderKey"),
        unix_millis($"o_orderdate".cast("timestamp")).as("epochMs"),
        $"o_orderstatus".as("status"), $"o_orderpriority".as("priority"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .as[RecordMerge.Rec]
    recs.groupByKey(_.cluster).agg(RecordMerge.merger.toColumn.name("m"))
      .select($"key".as("custkey"),
        $"m.firstOrderkey".as("first_orderkey"),
        $"m.baseStatus".as("base_status"),
        $"m.basePriority".as("base_priority"),
        $"m.statuses".as("statuses"),
        $"m.nMerged".as("n_merged"),
        $"m.totalCents".as("total_cents"))
  }

  import operators.LaMerge
  import operators.LaMerge.{LaDim, LaName, LaRecord, LaStatement, LaTimespan}

  final case class A2In(yuid: Long, ord: Int, ck: Long, rec: LaRecord)
  final case class A2Out(yuid: Long, rtype: String, label: String,
      n_merged: Long, names: String, idents: String, primary_name: String,
      n_stmts: Long, ai_stmt: String, n_dims: Long, eqs: String,
      ts_begin: String, ts_end: String)

  /** A2/A3/J10: the FULL record merger (operators.LaMerge) folding nested
    * Linked-Art records per cluster — type-conflict skips, should_merge
    * vetoes, identified_by dedupe + primary election, statement dedupe
    * with the single-AI rule, dimension identity, timespan
    * most-specific-interval with end-of-year fixup, id-set unions.
    * Records are derived deterministically from `customer`; the oracle
    * replays the fold's outcome relationally (the fold is order-sensitive,
    * but each rule's result is expressible as a window/aggregate because
    * the fixture pins the convergent cases — see rule-by-rule notes in
    * the SQL). Scale: one groupByKey(yuid) shuffle; clusters fold
    * independently in parallel, no driver state. */
  def recordMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cfg = LaMerge.MergeConfig(internalSources = Set("ycba"))
    val sources = Vector("ycba", "viaf", "wikidata", "aat", "tgn")
    val recs = Tables.load(spark, dir, "customer")
      .select($"c_custkey".cast("long"), $"c_mktsegment", $"c_name")
      .as[(Long, String, String)]
      .map { case (ck, seg, cname) =>
        val ord = (ck % 5).toInt
        val rtype = seg match {
          case "BUILDING"   => "Person"
          case "AUTOMOBILE" => "HumanMadeObject"
          case "MACHINERY"  => "Type"
          case "HOUSEHOLD"  => "Language"
          case _            => "Person"
        }
        val y = 1900 + (ck % 80)
        val k = ck % 3
        A2In(ck % 211, ord, ck, LaRecord(
          id = s"rec$ck", rtype = rtype, label = cname, source = sources(ord),
          identifiedBy = Seq(
            LaName("Name", s"nm${ck % 400}",
              if (ck % 3 == 0) Seq(LaMerge.primaryNameId) else Nil,
              if (ck % 2 == 0) Seq("en") else Nil),
            LaName("Identifier", s"id${ck % 350}", Nil, Nil)),
          referredToBy = Seq(LaStatement(null,
            if (ck % 10 == 0) s"AI generated note ${ck % 20}" else s"stmt${ck % 300}")),
          classifiedAs = Nil,
          equivalent = Seq(s"eq${ck % 300}"),
          memberOf = Nil, subjectOfAps = Nil, representationAps = Nil,
          dimensions = Seq(LaDim("h", (ck % 7).toDouble, s"u${ck % 2}")),
          timespan = Some(LaTimespan(s"$y-01-01T00:00:00Z", s"${y + k}-01-01T00:00:00Z", false)),
          definedBy = null, partOf = Nil, residence = Nil,
          contactPoints = Nil, broader = Nil))
      }
    recs.groupByKey(_.yuid).mapGroups { (yuid, it) =>
      val sorted = it.toSeq.sortBy(r => (r.ord, r.ck)).map(_.rec)
      val m = LaMerge.mergeCluster(sorted, cfg).get
      val r = m.record
      val names = r.identifiedBy.filter(_.ntype == "Name")
      A2Out(yuid, r.rtype, r.label, m.nMerged.toLong,
        names.map(_.content).distinct.sorted.mkString(";"),
        r.identifiedBy.filter(_.ntype == "Identifier")
          .map(_.content).distinct.sorted.mkString(";"),
        names.find(_.classifiedAs.contains(LaMerge.primaryNameId))
          .map(_.content).orNull,
        r.referredToBy.size.toLong,
        r.referredToBy.flatMap(s => Option(s.content))
          .find(_.contains("AI generated")).orNull,
        r.dimensions.size.toLong,
        r.equivalent.sorted.mkString(";"),
        r.timespan.map(_.begin).orNull, r.timespan.map(_.end).orNull)
    }.toDF()
  }

  /** The fold replayed relationally. Rule-by-rule:
    *  - base = first row by (ord, ck) per yuid;
    *  - veto-passing = base, plus candidates passing the J10 veto (HMO
    *    base x wikidata cand, HMO cand x wikidata base); of those,
    *    `compat` = type-compatible (same type, or Type/Language
    *    absorbing — order-free here because a Language candidate is
    *    accepted whenever it arrives);
    *  - n_merged counts ALL veto-passing rows — a type-conflicting
    *    candidate contributes no data but is still counted
    *    (merger.py:1007-1015 appends the source unconditionally);
    *  - resolved type upgrades Type -> Language iff any compat Language;
    *  - names/idents/eqs: distinct over compat (fold dedupes on content);
    *  - primary = first compat row (fold order) carrying the primary flag;
    *  - stmts: distinct non-AI + at most one AI (the first in fold order);
    *  - dims: distinct (value, unit) pairs (class is constant);
    *  - timespan: smallest POSITIVE interval in SECONDS wins (leap years
    *    make two same-k spans differ!), earliest in fold order on ties; a
    *    zero-length span never replaces (timedelta(0) falsy,
    *    merger.py:622) and a zero-length BASE span is unbeatable (nothing
    *    is < 0); end-of-year fixup applies only when a compat merge step
    *    actually ran. */
  private val recordMergeOracle: String =
    """WITH recs AS (
      |  SELECT c_custkey AS ck, c_custkey % 211 AS yuid, c_custkey % 5 AS ord,
      |    CASE c_custkey % 5 WHEN 0 THEN 'ycba' WHEN 1 THEN 'viaf'
      |      WHEN 2 THEN 'wikidata' WHEN 3 THEN 'aat' ELSE 'tgn' END AS source,
      |    CASE c_mktsegment WHEN 'BUILDING' THEN 'Person'
      |      WHEN 'AUTOMOBILE' THEN 'HumanMadeObject' WHEN 'MACHINERY' THEN 'Type'
      |      WHEN 'HOUSEHOLD' THEN 'Language' ELSE 'Person' END AS rtype,
      |    c_name AS label,
      |    'nm' || CAST(c_custkey % 400 AS VARCHAR) AS nm,
      |    (c_custkey % 3 = 0) AS is_primary,
      |    'id' || CAST(c_custkey % 350 AS VARCHAR) AS ident,
      |    CASE WHEN c_custkey % 10 = 0
      |      THEN 'AI generated note ' || CAST(c_custkey % 20 AS VARCHAR)
      |      ELSE 'stmt' || CAST(c_custkey % 300 AS VARCHAR) END AS stmt,
      |    (c_custkey % 10 = 0) AS is_ai,
      |    (c_custkey % 7) * 10 + (c_custkey % 2) AS dimkey,
      |    'eq' || CAST(c_custkey % 300 AS VARCHAR) AS eq,
      |    1900 + (c_custkey % 80) AS y, c_custkey % 3 AS k
      |  FROM customer),
      |ordered AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY yuid ORDER BY ord, ck) AS rn,
      |    epoch(CASE WHEN k = 1 THEN make_timestamp(y, 12, 31, 23, 59, 59)
      |      ELSE make_timestamp(y + k, 1, 1, 0, 0, 0) END)
      |      - epoch(make_timestamp(y, 1, 1, 0, 0, 0)) AS ts_secs
      |  FROM recs),
      |base AS (SELECT yuid, rtype AS btype, source AS bsource, label AS blabel
      |  FROM ordered WHERE rn = 1),
      |kept AS (
      |  SELECT o.*,
      |    (o.rn = 1
      |      OR (b.btype IN ('Person','HumanMadeObject') AND o.rtype = b.btype)
      |      OR (b.btype IN ('Type','Language') AND o.rtype IN ('Type','Language'))
      |    ) AS compat
      |  FROM ordered o JOIN base b USING (yuid)
      |  WHERE o.rn = 1 OR (
      |    NOT (b.btype = 'HumanMadeObject' AND o.source = 'wikidata')
      |    AND NOT (o.rtype = 'HumanMadeObject' AND b.bsource = 'wikidata'))),
      |agg AS (
      |  SELECT k2.yuid,
      |    COUNT(*) AS n_merged,
      |    bool_or(k2.compat AND k2.rn > 1) AS merged_any,
      |    array_to_string(list_sort(list(DISTINCT k2.nm) FILTER (WHERE k2.compat)), ';') AS names,
      |    array_to_string(list_sort(list(DISTINCT k2.ident) FILTER (WHERE k2.compat)), ';') AS idents,
      |    arg_min(k2.nm, k2.rn) FILTER (WHERE k2.is_primary AND k2.compat) AS primary_name,
      |    CAST(COUNT(DISTINCT k2.stmt) FILTER (WHERE NOT k2.is_ai AND k2.compat) AS BIGINT)
      |      + (CASE WHEN bool_or(k2.is_ai AND k2.compat) THEN 1 ELSE 0 END) AS n_stmts,
      |    arg_min(k2.stmt, k2.rn) FILTER (WHERE k2.is_ai AND k2.compat) AS ai_stmt,
      |    COUNT(DISTINCT k2.dimkey) FILTER (WHERE k2.compat) AS n_dims,
      |    array_to_string(list_sort(list(DISTINCT k2.eq) FILTER (WHERE k2.compat)), ';') AS eqs,
      |    arg_min(k2.y, CAST(k2.ts_secs AS BIGINT) * 100000 + k2.rn)
      |      FILTER (WHERE k2.ts_secs > 0 AND k2.compat) AS pos_y,
      |    arg_min(k2.k, CAST(k2.ts_secs AS BIGINT) * 100000 + k2.rn)
      |      FILTER (WHERE k2.ts_secs > 0 AND k2.compat) AS pos_k,
      |    MAX(CASE WHEN k2.rn = 1 THEN k2.y END) AS base_y,
      |    MAX(CASE WHEN k2.rn = 1 THEN k2.k END) AS base_k,
      |    bool_or(k2.rtype = 'Language' AND k2.compat) AS any_lang
      |  FROM kept k2 GROUP BY k2.yuid),
      |ts AS (
      |  SELECT yuid,
      |    CASE WHEN base_k = 0 THEN base_y ELSE pos_y END AS ts_y,
      |    CASE WHEN base_k = 0 THEN 0 ELSE pos_k END AS ts_k
      |  FROM agg)
      |SELECT a.yuid,
      |  CASE WHEN b.btype = 'Type' AND a.any_lang THEN 'Language'
      |    ELSE b.btype END AS rtype,
      |  b.blabel AS label,
      |  CAST(a.n_merged AS BIGINT) AS n_merged,
      |  a.names, a.idents, a.primary_name,
      |  CAST(a.n_stmts AS BIGINT) AS n_stmts, a.ai_stmt,
      |  CAST(a.n_dims AS BIGINT) AS n_dims, a.eqs,
      |  CAST(t.ts_y AS VARCHAR) || '-01-01T00:00:00Z' AS ts_begin,
      |  CASE WHEN a.merged_any AND t.ts_k = 1
      |    THEN CAST(t.ts_y AS VARCHAR) || '-12-31T23:59:59Z'
      |    ELSE CAST(t.ts_y + t.ts_k AS VARCHAR) || '-01-01T00:00:00Z'
      |  END AS ts_end
      |FROM agg a JOIN base b USING (yuid) JOIN ts t ON a.yuid = t.yuid""".stripMargin

  import operators.Cleaner

  final case class M13Out(id: Long, rtype: String, primary_name: String,
      sort_name: String, second_name: String, n_pages: Long, n_cls: Long,
      ts_begin: String, ts_end: String)

  /** M13: the final Cleaner (operators.Cleaner) over records derived from
    * `customer` — primary/sort-name election (length + Place-short-name
    * rotation + acronym demotion), webpage dedupe via URL variation sets,
    * property dedupe, metatype injection, timespan sentinels, display
    * ordering. Each record carries three names with deterministic flags;
    * the oracle replays the election decision tree as CASE expressions
    * (the fixture keeps all names in the no-language bucket so the
    * per-language loop collapses; multi-language buckets are covered by
    * CleanerSpec). Map-only: no shuffle at all — the Cleaner is
    * embarrassingly parallel at any scale. */
  def cleanNames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val metatypes = Map("eq0" -> Seq("mt1"), "eq1" -> Seq("mt2", "mt3"))
    Tables.load(spark, dir, "customer")
      .select($"c_custkey".cast("long"), $"c_name")
      .as[(Long, String)]
      .map { case (ck, cname) =>
        val n1 = LaName("Name", cname,
          (if (ck % 3 == 0) Seq(LaMerge.primaryNameId) else Nil) ++
            (if (ck % 7 == 0) Seq(LaMerge.alternateNameId) else Nil), Nil)
        val n2 = LaName("Name", s"NM${ck % 50}",
          (if (ck % 6 == 0) Seq(LaMerge.primaryNameId) else Nil) ++
            (if (ck % 5 == 0) Seq(LaMerge.sortNameId) else Nil), Nil)
        val n3 = LaName("Name", s"x${ck % 9}", Nil, Nil)
        val rec = LaRecord(s"rec$ck",
          if (ck % 4 == 0) "Place" else "Person", cname, "src")
          .copy(
            identifiedBy = Seq(n1, n2, n3),
            classifiedAs = Seq(s"c${ck % 5}", s"c${ck % 10}"),
            equivalent = Seq(s"eq${ck % 4}"),
            subjectOfAps = Seq(s"http://site${ck % 20}.org/p",
              s"http://www.site${ck % 20}.org/p") ++
              (if (ck % 3 == 0) Seq(s"http://other$ck.org") else Nil),
            timespan = Some(
              if (ck % 11 == 0) LaTimespan("1950-01-01T00:00:00", null, false)
              else if (ck % 11 == 1) LaTimespan(null, "1950-12-31T23:59:59", false)
              else LaTimespan("1950-01-01T00:00:00", "1950-12-31T23:59:59", false)))
        val out = Cleaner.clean(rec, metatypes).get
        val names = out.identifiedBy
        M13Out(ck, out.rtype,
          names.find(_.classifiedAs.contains(LaMerge.primaryNameId)).map(_.content).orNull,
          names.find(_.classifiedAs.contains(LaMerge.sortNameId)).map(_.content).orNull,
          names(1).content,
          out.subjectOfAps.size.toLong, out.classifiedAs.size.toLong,
          out.timespan.map(_.begin).orNull, out.timespan.map(_.end).orNull)
      }.toDF()
  }

  /** Election replayed as CASE logic (fixture pins one language bucket):
    *  - primary: existing primary wins (ck%3=0 -> the long mixed-case
    *    name, because the all-caps NM name is acronym-demoted when both
    *    are primary); otherwise shortest non-alternate candidate — the
    *    2-char name, except Places rotate sub-3-char names away (-> NM);
    *  - sort: the explicit sortName if present, else the elected primary;
    *  - second: display order is stable score-descending;
    *  - pages: the www variant always collapses; the extra URL survives;
    *  - classifications: dedupe + metatype injection from equivalents. */
  private val cleanNamesOracle: String =
    """SELECT c_custkey AS id,
      |  CASE WHEN c_custkey % 4 = 0 THEN 'Place' ELSE 'Person' END AS rtype,
      |  CASE WHEN c_custkey % 3 = 0 THEN c_name
      |    WHEN c_custkey % 4 = 0 THEN 'NM' || CAST(c_custkey % 50 AS VARCHAR)
      |    ELSE 'x' || CAST(c_custkey % 9 AS VARCHAR) END AS primary_name,
      |  CASE WHEN c_custkey % 5 = 0 THEN 'NM' || CAST(c_custkey % 50 AS VARCHAR)
      |    WHEN c_custkey % 3 = 0 THEN c_name
      |    WHEN c_custkey % 4 = 0 THEN 'NM' || CAST(c_custkey % 50 AS VARCHAR)
      |    ELSE 'x' || CAST(c_custkey % 9 AS VARCHAR) END AS sort_name,
      |  CASE WHEN c_custkey % 3 = 0 THEN 'NM' || CAST(c_custkey % 50 AS VARCHAR)
      |    ELSE c_name END AS second_name,
      |  CAST(1 + CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_pages,
      |  CAST((CASE WHEN c_custkey % 10 < 5 THEN 1 ELSE 2 END)
      |    + (CASE WHEN c_custkey % 4 = 0 THEN 1
      |        WHEN c_custkey % 4 = 1 THEN 2 ELSE 0 END) AS BIGINT) AS n_cls,
      |  CASE WHEN c_custkey % 11 = 1 THEN '-9999-01-01T00:00:00'
      |    ELSE '1950-01-01T00:00:00' END AS ts_begin,
      |  CASE WHEN c_custkey % 11 = 0 THEN '9999-12-31T23:59:59'
      |    ELSE '1950-12-31T23:59:59' END AS ts_end
      |FROM customer""".stripMargin

  final case class ClassMergeOut(id: Long, inf_csv: String, union_csv: String,
      contacts_csv: String, place: String)

  /** A10: the per-class merge handlers (`merger.py:107-330`) layered
    * over merge_common — influenced_by pairwise arbitration (uppercase
    * label election, specific-over-Type, silent drops, count-mismatch
    * keep-base), union-by-id with the self-id guard, contact_point
    * union by trimmed content, and merge_place's defined_by election
    * (parseable > unparseable, polygon > point, coords then textual
    * precision; both-unparseable DELETES). Every arm replayed. */
  def classMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.pipeline.ClassMerge
    import graft.pipeline.ClassMerge.Concept
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val l = s"L${ck % 9}"
        val (rc, mc) = (ck % 6) match {
          case 0 => (Seq(Concept(Some("c1"), l, "Type")),
            Seq(Concept(Some("c1"), l, "Type")))
          case 1 => (Seq(Concept(Some("c1"), "lower", "Type")),
            Seq(Concept(Some("c1"), s"Up$l ", "Type"))) // mc uppercase wins
          case 2 => (Seq(Concept(Some("c1"), s" b$l ", "Type")),
            Seq(Concept(Some("c1"), "upper", "Type"))) // base wins, trimmed
          case 3 => (Seq(Concept(Some("c2"), l, "Language")),
            Seq(Concept(Some("c1"), l, "Type"))) // specific over Type
          case 4 => (Seq(Concept(Some("c2"), l, "Type")),
            Seq(Concept(None, l, "Type"))) // missing id: dropped
          case _ => (Seq(Concept(Some("c1"), l, "Type")),
            Seq(Concept(Some("c1"), l, "Type"),
              Concept(Some("c2"), l, "Type"))) // count mismatch: keep base
        }
        val inf = ClassMerge.influencedBy(rc, mc)
        val union = ClassMerge.unionById(
          Seq(s"r${ck % 5}"),
          Seq(s"r${ck % 5}", s"self$ck", s"n${ck % 7}"),
          s"self$ck")
        val contacts = ClassMerge.unionByContent(
          Seq(" a@x "), Seq("a@x", s"b$ck@x"))
        val place = (ck % 7) match {
          case 0 => ClassMerge.placeDefinedBy("JUNK", "POINT (1.5 2.5)")
          case 1 => ClassMerge.placeDefinedBy("POINT (1.5 2.5)", "JUNK")
          case 2 => ClassMerge.placeDefinedBy("JUNK", "ALSOJUNK")
          case 3 => ClassMerge.placeDefinedBy("POINT (1.5 2.5)",
            s"POLYGON ((0.5 0.5, 1.5 0.5, 1.5 ${ck % 9}.5, 0.5 0.5))")
          case 4 => ClassMerge.placeDefinedBy(
            s"POLYGON ((0.5 0.5, 1.5 0.5, 1.5 ${ck % 9}.5, 0.5 0.5))",
            "POINT (9.5 9.5)")
          case 5 => ClassMerge.placeDefinedBy(
            "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 0.5))",
            s"POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 ${ck % 9}.5, 0.5 0.5))")
          case _ => ClassMerge.placeDefinedBy("POINT (1.5 2.5)",
            "POINT (1.25 2.5)") // longer first-coord text: more precise
        }
        ClassMergeOut(ck,
          inf.map(c => s"${c.id.getOrElse("")}|${c.label}|${c.typ}")
            .mkString(";"),
          union.mkString(";"), contacts.mkString(";"), place.orNull)
      }.toDF()
  }

  private val classMergeOracle: String =
    """WITH b AS (SELECT c_custkey AS ck FROM customer)
      |SELECT ck AS id,
      |  CASE ck % 6
      |    WHEN 0 THEN 'c1|L' || (ck % 9) || '|Type'
      |    WHEN 1 THEN 'c1|UpL' || (ck % 9) || '|Type'
      |    WHEN 2 THEN 'c1|bL' || (ck % 9) || '|Type'
      |    WHEN 3 THEN 'c2|L' || (ck % 9) || '|Language'
      |    WHEN 4 THEN ''
      |    ELSE 'c1|L' || (ck % 9) || '|Type' END AS inf_csv,
      |  'r' || (ck % 5) || ';n' || (ck % 7) AS union_csv,
      |  'a@x;b' || ck || '@x' AS contacts_csv,
      |  CASE ck % 7
      |    WHEN 0 THEN 'POINT (1.5 2.5)'
      |    WHEN 1 THEN 'POINT (1.5 2.5)'
      |    WHEN 2 THEN NULL
      |    WHEN 3 THEN 'POLYGON ((0.5 0.5, 1.5 0.5, 1.5 ' || (ck % 9)
      |      || '.5, 0.5 0.5))'
      |    WHEN 4 THEN 'POLYGON ((0.5 0.5, 1.5 0.5, 1.5 ' || (ck % 9)
      |      || '.5, 0.5 0.5))'
      |    WHEN 5 THEN 'POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 '
      |      || (ck % 9) || '.5, 0.5 0.5))'
      |    ELSE 'POINT (1.25 2.5)' END AS place
      |FROM b""".stripMargin

  final case class ActSpanOut(id: Long, fixed_end: String, winner: String)

  /** A11: merge_activity's timespan handling (`merger.py:542-624`) —
    * the year-span end fixup and the most-specific-span election
    * (estimated base yields; unparseable merge keeps base; missing
    * base bounds default to a huge span). */
  def activitySpan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.pipeline.ClassMerge
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey").cast("long"))
      .as[Long].map { ck =>
        val y = 1900 + ck % 90
        val fixedEnd = (ck % 3) match {
          case 0 => ClassMerge.fixEndOfEnd( // adjacent years: snaps back
            s"$y-01-01T00:00:00Z", s"${y + 1}-01-01T00:00:00Z")
          case 1 => ClassMerge.fixEndOfEnd( // gap of 2: untouched
            s"$y-01-01T00:00:00Z", s"${y + 2}-01-01T00:00:00Z")
          case _ => ClassMerge.fixEndOfEnd( // not Jan 1: untouched
            s"$y-03-01T00:00:00Z", s"${y + 1}-01-01T00:00:00Z")
        }
        val yearB = s"$y-01-01T00:00:00"
        val yearE = s"$y-12-31T23:59:59"
        val dayB = s"$y-06-01T00:00:00Z"
        val dayE = s"$y-06-01T23:59:59Z"
        val take = (ck % 5) match {
          case 0 => ClassMerge.takeMergeTimespan(recEstimated = true,
            dayB, dayE, yearB, yearE) // estimated base always yields
          case 1 => ClassMerge.takeMergeTimespan(recEstimated = false,
            yearB, yearE, dayB, dayE) // merge more specific: take it
          case 2 => ClassMerge.takeMergeTimespan(recEstimated = false,
            dayB, dayE, yearB, yearE) // base more specific: keep
          case 3 => ClassMerge.takeMergeTimespan(recEstimated = false,
            yearB, yearE, "garbage", dayE) // merge unparseable: keep
          case _ => ClassMerge.takeMergeTimespan(recEstimated = false,
            yearB, "", dayB, dayE) // base missing end: huge, merge wins
        }
        ActSpanOut(ck, fixedEnd, if (take) "merge" else "rec")
      }.toDF()
  }
  private val activitySpanOracle: String =
    """WITH b AS (SELECT c_custkey AS ck, 1900 + c_custkey % 90 AS y
      |  FROM customer)
      |SELECT ck AS id,
      |  CASE ck % 3
      |    WHEN 0 THEN y || '-12-31T23:59:59Z'
      |    WHEN 1 THEN (y + 2) || '-01-01T00:00:00Z'
      |    ELSE (y + 1) || '-01-01T00:00:00Z' END AS fixed_end,
      |  CASE ck % 5 WHEN 0 THEN 'merge' WHEN 1 THEN 'merge'
      |    WHEN 2 THEN 'rec' WHEN 3 THEN 'rec' ELSE 'merge' END AS winner
      |FROM b""".stripMargin

  final case class W2bOut(id: Long, names: String)

  /** Flag glyphs for the w2b serialization — one char per classified_as
    * entry IN LIST ORDER, so flag multiplicity and append position are
    * both pinned (the doubled primary of mapper.py:480+485 reads "PP"). */
  private def flagChar(id: String): String = id match {
    case LaMerge.primaryNameId        => "P"
    case LaMerge.alternateNameId      => "A"
    case LaMerge.sortNameId           => "S"
    case operators.Cleaner.officialNameId    => "O"
    case operators.Cleaner.alternateTitleId  => "T"
    case operators.Cleaner.translatedTitleId => "R"
    case _                            => "X"
  }

  /** The ELECTION differential (w2b) — the f1b/f8b/f18b pattern on the
    * Cleaner's primary/sort-name election (`final/mapper.py:366-646`,
    * the last rich reference semantics without one): per customer, 19
    * decoration arms, one per rung of the tie-break ladder — shortest-
    * unclassified, the length-tie REVERSAL (unclassified names are
    * insert(0)'d, so later slots win ties, :445), the officialName
    * short-circuit (:447-449, later names never scanned), alternate
    * exclusion, the all-alternate overwrite with its DOUBLED primary
    * (:480 replace + :485 unconditional append), multi-primary shortest
    * + loser de-flagging (:529-538), the multi-primary tie (stable —
    * primaries do NOT reverse), acronym demotion (:518-527) and its
    * all-acronym no-op, the sub-3-char Place rotation in both the
    * candidate (:466-468) and primary (:510-514) paths with a Person
    * control arm, both-flag resolution order (:405-422), per-language
    * bucket independence with the en>none>first sort fallback
    * (:563-575), sort-name election across buckets (:544-562), and the
    * cross-bucket de-flag corner where the fallback target lost its
    * classified_as to a later bucket's election and the sort flag is
    * silently SKIPPED (:530 del + :574 key guard). Suffix lengths are
    * permuted by ck so the winner varies with the data and the oracle
    * must re-derive each argmin. Output: the full display-ordered name
    * list with per-name flag strings — election winners, flag
    * multiplicity/order, de-flagging, and display ordering all hash.
    * Oracle: re-derived from the PYTHON source, sharing no code — its
    * construction found TWO engine parity gaps (the doubled primary;
    * the skipped sort fallback), both fixed in Cleaner this round.
    * Map-only at any scale (the Cleaner is embarrassingly parallel). */
  def electionDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import operators.Cleaner
    val P = LaMerge.primaryNameId
    val A = LaMerge.alternateNameId
    val S = LaMerge.sortNameId
    val O = Cleaner.officialNameId
    val AT = Cleaner.alternateTitleId
    val TT = Cleaner.translatedTitleId
    val X = "urn:graft:neutral"
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey").cast("long")).as[Long]
      .flatMap { ck =>
        val b = "n" + (ck % 1000)
        // distinct suffix lengths permuted by ck: the shortest slot is
        // data-dependent, so the oracle re-derives the comparison
        val perms = Vector((1, 3, 5), (1, 5, 3), (3, 1, 5),
          (3, 5, 1), (5, 1, 3), (5, 3, 1))
        val (pa, pb, _) = perms((ck % 6).toInt)
        val pc = perms((ck % 6).toInt)._3
        def xs(n: Int) = "x" * n
        val z2 = "z" + (ck % 10)    // 2 chars: the sub-3 Place rule
        val caps = "NM" + (ck % 10) // all-caps acronym
        val caps2 = "NMA" + (ck % 10)
        def N(c: String, cls: Seq[String] = Nil,
            langs: Seq[String] = Seq("en")) = LaName("Name", c, cls, langs)
        val arms: Seq[(Int, String, Seq[LaName])] = Seq(
          (0, "Person", Seq(N(b + xs(pa)), N(b + xs(pb)), N(b + xs(pc)))),
          (1, "Person", Seq(N(b + "xa"), N(b + "yyyy"), N(b + "xb"))),
          (2, "Person", Seq(N(b + xs(4)), N(b + "off" + xs(2), Seq(O)), N(b))),
          (3, "Person", Seq(N(b, Seq(A)), N(b + xs(2), Seq(X)), N(b + xs(4)))),
          (4, "Person", Seq(N(b + xs(2), Seq(A)), N(b, Seq(AT)), N(b + xs(4), Seq(TT)))),
          (5, "Person", Seq(N(b + xs(pa), Seq(P, X)), N(b + xs(pb), Seq(P)), N(b + "qqqqqqq"))),
          (6, "Person", Seq(N(b + "ta", Seq(P)), N(b + "tb", Seq(P)))),
          (7, "Group", Seq(N(caps, Seq(P)), N(b + "long", Seq(P)))),
          (8, "Group", Seq(N(caps2, Seq(P)), N(caps, Seq(P)))),
          (9, "Place", Seq(N(z2), N(b + xs(2)))),
          (10, "Person", Seq(N(z2), N(b + xs(2)))),
          (11, "Place", Seq(N(z2, Seq(P)), N(b + xs(2), Seq(P)))),
          (12, "Person", Seq(N(b + xs(2), Seq(P, A)), N(b, Seq(P, A)))),
          (13, "Person", Seq(N(b + xs(2), Seq(P)), N(b, Seq(P, A)))),
          (14, "Person", Seq(N(b + xs(2)), N(b, langs = Seq("fr")), N(b + xs(4), langs = Nil))),
          (15, "Group", Seq(N(b + xs(2), Seq(S)), N(b, Seq(S), Seq("fr")), N(b + xs(4)))),
          (16, "Group", Seq(N(b + xs(2), Seq(S), Seq("fr")), N(b, langs = Seq("fr")))),
          (17, "Person", Seq(N(b, langs = Seq("fr")))),
          (18, "Person", Seq(N(b + xs(2), langs = Seq("en", "fr")), N(b, Seq(P), Seq("fr")))),
          // the deleted-vs-empty distinction (:530 del vs the [P,P]
          // overwrite stripping to an empty-but-PRESENT list): the
          // all-alternate en bucket promotes s1 to [P,P]; fr's shorter
          // primary strips BOTH (len 2 ≠ 1, no del) — so the :574
          // key-presence guard still lets the sort fallback flag s1
          (19, "Person", Seq(N(b + xs(2), Seq(A), Seq("en", "fr")),
            N(b + xs(4), Seq(AT)), N(b, Seq(P), Seq("fr")))))
        arms.map { case (arm, rtype, nms) =>
          val rec = LaRecord(s"r$ck-$arm", rtype, s"lbl$ck", "src")
            .copy(identifiedBy = nms)
          val out = Cleaner.electNames(rec).get
          W2bOut(ck * 100 + arm, out.map(n =>
            n.content + ":" + n.classifiedAs.map(flagChar).mkString)
            .mkString(";"))
        }
      }.toDF()
  }

  /** Each arm's expected display list, re-derived from mapper.py (see
    * electionDiff scaladoc). pa/pb/pc replicate the suffix permutation;
    * the per-arm winner is an explicit comparison, not a copied list. */
  private val electionDiffOracle: String =
    """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS ck FROM customer),
      |p AS (SELECT ck,
      |    'n' || (ck % 1000) AS b,
      |    CASE ck % 6 WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 3
      |      WHEN 3 THEN 3 ELSE 5 END AS pa,
      |    CASE ck % 6 WHEN 0 THEN 3 WHEN 1 THEN 5 WHEN 2 THEN 1
      |      WHEN 3 THEN 5 WHEN 4 THEN 1 ELSE 3 END AS pb,
      |    CASE ck % 6 WHEN 0 THEN 5 WHEN 1 THEN 3 WHEN 2 THEN 5
      |      WHEN 3 THEN 1 WHEN 4 THEN 3 ELSE 1 END AS pc,
      |    'z' || (ck % 10) AS z2,
      |    'NM' || (ck % 10) AS caps,
      |    'NMA' || (ck % 10) AS caps2
      |  FROM c)
      |SELECT ck*100+0 AS id,
      |  CASE WHEN pa < pb AND pa < pc
      |    THEN b||repeat('x',pa)||':PS;'||b||repeat('x',pb)||':;'||b||repeat('x',pc)||':'
      |  WHEN pb < pc
      |    THEN b||repeat('x',pb)||':PS;'||b||repeat('x',pa)||':;'||b||repeat('x',pc)||':'
      |  ELSE b||repeat('x',pc)||':PS;'||b||repeat('x',pa)||':;'||b||repeat('x',pb)||':'
      |  END AS names FROM p
      |UNION ALL
      |SELECT ck*100+1, b||'xb:PS;'||b||'xa:;'||b||'yyyy:' FROM p
      |UNION ALL
      |SELECT ck*100+2, b||'offxx:OPS;'||b||'xxxx:;'||b||':' FROM p
      |UNION ALL
      |SELECT ck*100+3, b||'xx:XPS;'||b||':A;'||b||'xxxx:' FROM p
      |UNION ALL
      |SELECT ck*100+4, b||'xx:PPS;'||b||':T;'||b||'xxxx:R' FROM p
      |UNION ALL
      |SELECT ck*100+5,
      |  CASE WHEN pa < pb
      |    THEN b||repeat('x',pa)||':PXS;'||b||repeat('x',pb)||':;'||b||'qqqqqqq:'
      |    ELSE b||repeat('x',pb)||':PS;'||b||repeat('x',pa)||':X;'||b||'qqqqqqq:'
      |  END FROM p
      |UNION ALL
      |SELECT ck*100+6, b||'ta:PS;'||b||'tb:' FROM p
      |UNION ALL
      |SELECT ck*100+7, b||'long:PS;'||caps||':' FROM p
      |UNION ALL
      |SELECT ck*100+8, caps||':PS;'||caps2||':' FROM p
      |UNION ALL
      |SELECT ck*100+9, b||'xx:PS;'||z2||':' FROM p
      |UNION ALL
      |SELECT ck*100+10, z2||':PS;'||b||'xx:' FROM p
      |UNION ALL
      |SELECT ck*100+11, b||'xx:PS;'||z2||':' FROM p
      |UNION ALL
      |SELECT ck*100+12, b||'xx:PS;'||b||':A' FROM p
      |UNION ALL
      |SELECT ck*100+13, b||'xx:PS;'||b||':A' FROM p
      |UNION ALL
      |SELECT ck*100+14, b||'xx:PS;'||b||':P;'||b||'xxxx:P' FROM p
      |UNION ALL
      |SELECT ck*100+15, b||'xx:SP;'||b||'xxxx:;'||b||':P' FROM p
      |UNION ALL
      |SELECT ck*100+16, b||':P;'||b||'xx:S' FROM p
      |UNION ALL
      |SELECT ck*100+17, b||':PS' FROM p
      |UNION ALL
      |SELECT ck*100+18, b||'xx:;'||b||':P' FROM p
      |UNION ALL
      |SELECT ck*100+19, b||'xx:S;'||b||'xxxx:T;'||b||':P' FROM p""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("a11_activity_span", activitySpan, Some(activitySpanOracle)))
    Queries.register(QueryDef("a10_class_merge", classMerge, Some(classMergeOracle)))
    Queries.register(QueryDef("a1_merge_fold", mergeFold, Some(mergeFoldOracle), bench = true))
    Queries.register(QueryDef("a2_record_merge", recordMerge, Some(recordMergeOracle)))
    Queries.register(QueryDef("m13_clean_names", cleanNames, Some(cleanNamesOracle)))
    Queries.register(QueryDef("w2b_election_diff", electionDiff, Some(electionDiffOracle)))
  }

  private val mergeFoldOracle: String =
    """WITH ranked AS (
      |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderpriority,
      |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
      |  FROM orders)
      |SELECT o_custkey AS custkey,
      |  MAX(CASE WHEN rn = 1 THEN o_orderkey END) AS first_orderkey,
      |  MAX(CASE WHEN rn = 1 THEN o_orderstatus END) AS base_status,
      |  MAX(CASE WHEN rn = 1 THEN o_orderpriority END) AS base_priority,
      |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
      |  COUNT(*) AS n_merged,
      |  CAST(SUM(cents) AS BIGINT) AS total_cents
      |FROM ranked GROUP BY o_custkey""".stripMargin
}
