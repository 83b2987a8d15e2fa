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

  override def register(): Unit = {
    Queries.register(QueryDef("a1_merge_fold", mergeFold, Some(mergeFoldOracle), bench = true))
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
