package graft

import org.apache.spark.sql.functions._

/** Ad-hoc experiments main (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.create("scratch", "8")
    import spark.implicits._
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val tokens = filter(split($"text", "\\s+"), x => x =!= "")
    val wordHash = (w: org.apache.spark.sql.Column) =>
      aggregate(transform(split(w, ""), c => ascii(c).cast("long")),
        lit(0L), (a, c) => (a * 31 + c) % 2147483647L)
    d.select($"doc_id", aggregate(transform(tokens, wordHash),
        lit(0L), (a, b) => (a * 131 + b) % 2147483647L).as("fp"))
      .orderBy($"doc_id").show(3)
    spark.stop()
  }
}
