package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access: one parquet file per table under an sf dir
  * (see TESTDATA.md). At 100 TB these would be partitioned parquet/Delta
  * directories; the reader call is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")
}
