package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.Lineage

class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("aggregated join output traces to its source columns") {
    import spark.implicits._
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val o = Tables.load(spark, TestSpark.sf, "orders")
    val df = li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
    val lin = Lineage.columnLineage(df)
    assert(lin("revenue") ===
      Set("lineitem.l_extendedprice", "lineitem.l_discount"))
    assert(lin("o_custkey") === Set("orders.o_custkey"))
    assert(lin("n_items") === Set.empty[String])
  }

  test("lineage flows through explode and window expressions") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val df = docs
      .select($"lang", explode(split($"text", " ")).as("word"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"lang").orderBy($"word")))
    val lin = Lineage.columnLineage(df)
    assert(lin("word") === Set("documents.text"))
    assert(lin("rk") === Set("documents.text", "documents.lang"))
  }

  test("a registered query's lineage names only real table columns") {
    val lin = Lineage.columnLineage(
      Queries.queries("q3_revenue_nation_year")(spark, TestSpark.sf))
    val all = lin.values.flatten.toSet
    assert(all.nonEmpty)
    val tables = all.map(_.split("\\.")(0))
    assert(tables.subsetOf(
      Set("lineitem", "orders", "customer", "nation", "region", "supplier", "part")),
      s"unexpected sources: $tables")
  }
}
