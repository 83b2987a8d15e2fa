package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times the headline query set (bench-flagged in
  * the registry — one per operator family: scan-agg, join-agg, window,
  * LSH dedup, vector search, iterative CC, query language, event-time
  * window) and prints ONE JSON line. count() forces full execution
  * without collecting rows to the driver. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.create("graft-bench", cpus)
    val fns = Queries.queries
    // JIT/codegen warmup so the first timed query isn't penalized
    fns("q1_agg")(spark, sfDir).count()
    val results = Queries.benchNames.map { name =>
      val t0 = System.nanoTime()
      try { fns(name)(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
