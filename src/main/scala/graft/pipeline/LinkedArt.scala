package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The minimum end-to-end Linked-Art slice (SURVEY §7.2, FIXTURES.md §A):
  * record envelopes with JSON-LD bodies → name extraction → name/URI
  * reconciliation against index tables with differentFrom veto →
  * connected-components idmap with deterministic YUID minting →
  * reference re-identification → cluster merge → export rows.
  *
  * Every stage is a DataFrame transform; per-record Python loops of the
  * reference (`run-reconcile.py:109-148`, `run-merge.py:105-168`) become
  * joins over the envelope table. Fixtures replay hermetically in
  * LinkedArtPipelineSpec, mirroring the reference's golden-dataset test
  * strategy (`make_test_dataset.py`).
  */
object LinkedArt {

  /** JSON-LD subset schema (FIXTURES.md §A.2): names + equivalents. */
  val bodySchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("_label", StringType),
    StructField("identified_by", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("content", StringType),
      StructField("part", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("content", StringType))))))))),
    StructField("equivalent", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("type", StringType))))),
    StructField("refers_to", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("type", StringType))))),
    StructField("defined_by", StringType))) // WKT geometry (Places)

  /** Parse envelope `data` into the typed body column. */
  def parsed(envelopes: DataFrame): DataFrame =
    envelopes.withColumn("body", from_json(col("data"), bodySchema))

  /** F7: candidate names per record — every Name content plus the
    * `last, first` permutation of two-part names; cleaned (lower, trim,
    * zero-width strip), prioritized. */
  def candidateNames(parsedEnv: DataFrame): DataFrame = {
    val names = parsedEnv.select(col("identifier"), col("source"),
      col("body.type").as("rectype"),
      explode(filter(col("body.identified_by"), n => n.getField("type") === "Name"))
        .as("nm"))
    def clean(c: org.apache.spark.sql.Column) =
      lower(trim(regexp_replace(c, "[\\u200b\\u200e\\u200f]", "")))
    val direct = names.select(col("identifier"), col("source"), col("rectype"),
      clean(col("nm.content")).as("name"), lit(1).as("priority"))
    val swapped = names
      .filter(size(col("nm.part")) === 2)
      .select(col("identifier"), col("source"), col("rectype"),
        clean(concat(element_at(col("nm.part"), 2).getField("content"), lit(", "),
          element_at(col("nm.part"), 1).getField("content"))).as("name"),
        lit(2).as("priority"))
    direct.union(swapped).filter(length(col("name")) > 0 && length(col("name")) <= 499)
  }

  /** J1+J2+J4: reconciliation edges. Name pass: exact equi-join against
    * the name index, same-type required. URI pass: equivalents against
    * the uri index (cross-type allowed per reconciler.py:248). Vetoed by
    * the differentFrom cannot-link table (either direction). Output
    * (src, dst) qua-key edges: "uri##quaType". */
  def reconcileEdges(parsedEnv: DataFrame, nameIndex: DataFrame,
      uriIndex: DataFrame, differentFrom: DataFrame): DataFrame = {
    val qua = (u: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =>
      concat(u, lit("##qua"), t)
    val self = parsedEnv.select(col("body.id").as("selfUri"),
      col("body.type").as("rectype"), col("identifier"))
    val byName = candidateNames(parsedEnv)
      .join(nameIndex, Seq("name"))
      .filter(col("rectype") === col("idxtype"))
      .join(self.select(col("identifier"), col("selfUri")), Seq("identifier"))
      .select(qua(col("selfUri"), col("rectype")).as("src"),
        qua(col("idxuri"), col("idxtype")).as("dst"))
    // F8: equivalents are canonicalized before the index lookup
    // (reference: config.canonicalize inside the reconciler walk); URIs
    // outside the routing table fall back to their raw form — they
    // simply miss the (canonical-keyed) index, same outcome as the
    // reference trashing them
    val byUri = parsedEnv.select(col("body.id").as("selfUri"),
        col("body.type").as("rectype"),
        explode(col("body.equivalent")).as("eq"))
      .join(uriIndex,
        coalesce(graft.functions.UriCanon.canonicalize(col("eq.id")),
          col("eq.id")) === col("idxuri"))
      .select(qua(col("selfUri"), col("rectype")).as("src"),
        qua(col("idxuri"), col("idxtype")).as("dst"))
    val edges = byName.union(byUri).distinct()
    // differentFrom veto, both directions (qua-keyed pairs)
    edges
      .join(differentFrom, edges("src") === differentFrom("a") &&
        edges("dst") === differentFrom("b"), "left_anti")
      .join(differentFrom, edges("src") === differentFrom("b") &&
        edges("dst") === differentFrom("a"), "left_anti")
  }

  /** Every record's identity self-edge — ensures records with no
    * equivalences still mint their own YUID (reference: mint-on-miss,
    * `storage/idmap/redis.py:212-229`). */
  def selfEdges(parsedEnv: DataFrame): DataFrame =
    parsedEnv.select(
      concat(col("body.id"), lit("##qua"), col("body.type")).as("src"),
      concat(col("body.id"), lit("##qua"), col("body.type")).as("dst"))

  /** J7: idmap — connected components over qua-key edges (string keys are
    * dictionary-encoded to longs for the CC loop, then mapped back) with
    * deterministic YUID minting: uuid from the component's minimal
    * qua-key (uuid5-style namespace hashing). */
  def idmap(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // Collision-FREE dictionary encoding: monotonically_increasing_id is
    // unique by construction (partition id << 33 | row index), unlike a
    // 64-bit hash whose birthday collisions at billions of nodes would
    // silently merge two unrelated identity clusters. The assignment is
    // partition-dependent, so it is pinned with an eager localCheckpoint —
    // every downstream join sees the same qua->nid mapping. Determinism of
    // the OUTPUT is unaffected: YUIDs are minted from the component's min
    // qua STRING, never from nid.
    val nodes = edges.select($"src".as("qua"))
      .union(edges.select($"dst".as("qua"))).distinct()
      .withColumn("nid", monotonically_increasing_id())
      .localCheckpoint()
    val e = edges
      .join(nodes.select($"qua".as("src"), $"nid".as("srcId")), "src")
      .join(nodes.select($"qua".as("dst"), $"nid".as("dstId")), "dst")
      .select($"srcId".as("src"), $"dstId".as("dst"))
    val comps = graft.operators.Graph.connectedComponents(e)
    val mint = udf((key: String) =>
      java.util.UUID.nameUUIDFromBytes(("graft:yuid:" + key)
        .getBytes("UTF-8")).toString)
    val canon = nodes.join(comps, nodes("nid") === comps("node"))
      .groupBy($"component").agg(min($"qua").as("minQua"))
      .select($"component", mint($"minQua").as("yuid"))
    nodes.join(comps, nodes("nid") === comps("node"))
      .join(canon, "component")
      .select($"qua", $"yuid")
  }

  /** J8: re-identify — rewrite every nested reference through the idmap
    * (qua-keyed); unmapped references stay (do_not_reidentify). */
  def reidentify(parsedEnv: DataFrame, idmapDf: DataFrame): DataFrame = {
    val refs = parsedEnv.select(col("identifier"),
      explode(col("body.refers_to")).as("r"))
      .select(col("identifier"),
        concat(col("r.id"), lit("##qua"), col("r.type")).as("qua"))
    refs.join(idmapDf, Seq("qua"), "left")
      .groupBy(col("identifier"))
      .agg(sort_array(collect_list(coalesce(col("yuid"), col("qua"))))
        .as("refs_rewritten"))
  }

  /** J9-J11 + A1/A2: merge each yuid cluster — records sorted by
    * merge_order (source preference), first label wins, equivalents
    * union. Type-dispatched rule (A2, merger.py:177-244): Place
    * geometry elects polygon > point > none, then more coordinates,
    * REGARDLESS of merge order. Produces one merged row per yuid. */
  def merge(parsedEnv: DataFrame, idmapDf: DataFrame,
      mergeOrder: Map[String, Int]): DataFrame = {
    val spark = parsedEnv.sparkSession
    import spark.implicits._
    val orderCol = coalesce(
      element_at(typedLit(mergeOrder), col("source")), lit(99))
    // columnar WKT inspection (codegen'd; the UDF forms fell out of
    // whole-stage codegen, flagged in round 3 review)
    val kindUdf = (c: org.apache.spark.sql.Column) => graft.functions.Wkt.kindCol(c)
    val coordsUdf = (c: org.apache.spark.sql.Column) => graft.functions.Wkt.coordCountCol(c)
    val withYuid = parsedEnv
      .withColumn("qua", concat(col("body.id"), lit("##qua"), col("body.type")))
      .join(idmapDf, Seq("qua"))
    withYuid
      .select($"yuid", orderCol.as("ord"), $"identifier",
        $"body._label".as("label"), $"body.type".as("rectype"),
        coalesce($"body.equivalent.id", array().cast("array<string>")).as("eqs"),
        $"body.defined_by".as("wkt"),
        // geometry preference key, ascending sort: polygon first, then
        // more coords, then merge order
        struct(
          when(kindUdf($"body.defined_by") === "POLYGON", 0)
            .when(kindUdf($"body.defined_by") === "POINT", 1)
            .otherwise(2).as("kindRank"),
          (-coalesce(coordsUdf($"body.defined_by"), lit(0))).as("negCoords"),
          orderCol.as("ord"), $"identifier".as("tie"),
          $"body.defined_by".as("wkt")).as("geomKey"))
      .groupBy($"yuid")
      .agg(
        element_at(sort_array(collect_list(struct($"ord", $"identifier", $"label"))), 1)
          .getField("label").as("label"),
        min($"rectype").as("rectype"),
        array_sort(array_distinct(flatten(collect_list($"eqs")))).as("equivalents"),
        element_at(sort_array(collect_list($"geomKey")), 1)
          .getField("wkt").as("geometry"),
        count(lit(1)).as("n_merged"))
  }

  /** K1: export shape — merged rows as compact JSONL strings. */
  def exportJsonl(merged: DataFrame): DataFrame =
    merged.select(to_json(struct(col("yuid"), col("label"), col("rectype"),
      col("equivalents"), col("n_merged"))).as("line"))
}
