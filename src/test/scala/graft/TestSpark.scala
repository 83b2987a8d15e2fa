package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test run (cuts per-suite JVM cost). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.create("graft-test", "4")
  val sf: String = "/root/testdata/sf0.001"
}
