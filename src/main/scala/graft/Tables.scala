package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    // events.ts parquet flavor varies by generator run: TIMESTAMP(NANOS)
    // reads as long (nanosAsLong) and is truncated to micros like
    // DuckDB/engines with µs timestamps do; µs without the UTC flag can
    // read as TIMESTAMP_NTZ (when a caller's session didn't disable NTZ
    // inference) and is cast to plain TIMESTAMP — identity on the stored
    // micros under the pinned UTC session. Either way both engines see
    // identical values.
    // NB: integer `div`, not `/` — ns values are ~2^60 and IEEE double
    // division would round the low microsecond digit.
    if (table == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (table == "events" && df.schema("ts").dataType == TimestampNTZType) {
      // the NTZ→TZ cast reinterprets wall-clock in the SESSION timezone;
      // it is value-preserving only under UTC (Sessions.create pins it).
      // A caller with its own non-UTC session would silently shift every
      // event timestamp — fail loudly instead.
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      // accept any zone id equivalent to UTC (Etc/UTC, GMT, +00:00…):
      // the cast is value-preserving for all of them
      val utc = try {
        java.time.ZoneId.of(tz).getRules.isFixedOffset &&
          java.time.ZoneId.of(tz).getRules.getOffset(java.time.Instant.EPOCH)
            .getTotalSeconds == 0
      } catch { case _: Exception => false }
      require(utc,
        s"events.ts is TIMESTAMP_NTZ; casting to TIMESTAMP needs a " +
          s"UTC-equivalent spark.sql.session.timeZone (got $tz) to preserve values")
      df.withColumn("ts", col("ts").cast(TimestampType))
    }
    else df
  }
}
