package graft

/** Plan audit helper: prints formatted physical plans for the headline
  * queries so pushdown/broadcast/codegen can be inspected per round. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Sessions.create("graft-explain", "4")
    val fns = Queries.queries
    val names = if (args.length > 1) args.drop(1).toSeq else Queries.benchNames
    names.foreach { n =>
      println(s"\n========== $n ==========")
      fns(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
