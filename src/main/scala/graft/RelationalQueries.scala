package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator surface (SURVEY.md §2.1/2.5/2.6): scans with
  * pushdown, grouped aggregation with exact quantized arithmetic, joins,
  * windows, set ops. Each query mirrors a reference operator's shape over
  * the deterministic test tables.
  */
object RelationalQueries extends QueryGroup {

  /** Exact money arithmetic: double dollars -> integer cents (BIGINT). */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  /** double 0.xx rate -> integer percent. */
  private def pct(c: Column): Column = round(c * 100).cast("long")

  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
    // TPC-H Q1 shape (reference analog: per-type grouped stats, SURVEY A5/A7)
    li.filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(round($"l_quantity").cast("long")).cast("long").as("sum_qty"),
        sum(cents($"l_extendedprice")).cast("long").as("sum_base_cents"),
        (sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount")))
          .cast("double") / 10000.0).as("sum_disc_price"),
        (sum(cents($"l_extendedprice") * (lit(100L) - pct($"l_discount"))
          * (lit(100L) + pct($"l_tax"))).cast("double") / 1000000.0).as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  val q1AggOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS DOUBLE) / 1000000.0 AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("q1_agg", q1Agg, Some(q1AggOracle), bench = true))
  }
}
