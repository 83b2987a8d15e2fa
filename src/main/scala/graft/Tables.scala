package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Test-table access: one parquet file per table under an sf dir
  * (see TESTDATA.md). At 100 TB these would be partitioned parquet/Delta
  * directories; the reader call is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): Spark reads it as long
    // (nanosAsLong); truncate to micros like DuckDB/engines with µs
    // timestamps do, so both sides see identical values.
    // NB: integer `div`, not `/` — ns values are ~2^60 and IEEE double
    // division would round the low microsecond digit.
    if (table == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
