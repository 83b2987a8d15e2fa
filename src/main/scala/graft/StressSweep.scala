package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Executes EVERY registered query against a (stress) sf dir with full
  * row evaluation — the completion-at-scale companion to Bench: where
  * BENCH_sf1 times 21 keys, this proves the whole registry RUNS on the
  * 10× skew-injected corpus (no ANSI throw, no overflow, no guard that
  * only held at fixture scale). foreach, not count — count() prunes the
  * projections where divisions/casts live (the DegenerateDocsSpec
  * lesson).
  *
  * Per-query TIMEOUT via job-group cancellation: pair-LISTING queries
  * (all-pairs outputs like d4/d19/j17) have output quadratic in
  * duplicate-clique size BY CONTRACT, so against a corpus with a
  * 100k-duplicate clique their answer itself is petabyte-shaped — the
  * pipeline composes them after exact dedup (t_corpus_pipeline's stage
  * order), which collapses the clique. A timeout is reported loudly
  * (never silently skipped) with that contract note.
  *
  * Usage: runMain graft.StressSweep [sfDir] [timeoutSecs]
  */
object StressSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_stress/sf1")
    val timeoutSecs = args.lift(1).map(_.toLong).getOrElse(300L)
    val spark = Sessions.create("graft-stress-sweep",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    var failed = List.empty[String]
    var timedOut = List.empty[String]
    val timings = Queries.all.map { q =>
      val t0 = System.nanoTime()
      val group = s"sweep-${q.name}"
      val fut = Future {
        spark.sparkContext.setJobGroup(group, q.name, interruptOnCancel = true)
        try { q.fn(spark, sfDir).foreach(_ => ()); "ok" }
        finally spark.sparkContext.clearJobGroup()
      }
      val r = try Await.result(fut, timeoutSecs.seconds)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          // AndFutureJobs: plain cancelJobGroup kills only currently
          // running jobs — an iterative query (fixpoint loops) would
          // keep submitting follow-on jobs from the zombie future and
          // skew the timing/clearCache of subsequent entries. Then
          // wait (bounded) for the future to actually drain before the
          // next query starts.
          spark.sparkContext.cancelJobGroupAndFutureJobs(group)
          try Await.ready(fut, 60.seconds)
          catch { case _: java.util.concurrent.TimeoutException =>
            println(s"[sweep] ${q.name}: zombie future did not drain in 60s")
          }
          timedOut ::= q.name
          s"TIMEOUT >${timeoutSecs}s (if a pair-lister: output is quadratic " +
            "in dup-clique size by contract; compose after exact dedup)"
        case e: Throwable =>
          failed ::= q.name
          "FAIL " + String.valueOf(e.getMessage).linesIterator.next().take(120)
      }
      spark.catalog.clearCache()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] ${q.name}%-28s $secs%7.2f s  $r")
      q.name -> secs
    }
    val total = timings.map(_._2).sum
    val slowest = timings.sortBy(-_._2).take(10)
      .map { case (n, s) => f"$n=$s%.1f" }.mkString(", ")
    println(f"[sweep] TOTAL ${timings.size} queries $total%.1f s; slowest: $slowest")
    if (timedOut.nonEmpty)
      println(s"[sweep] TIMED OUT (reported, not silent): ${timedOut.reverse.mkString(", ")}")
    if (failed.nonEmpty) {
      println(s"[sweep] FAILED: ${failed.reverse.mkString(", ")}")
      spark.stop(); sys.exit(1)
    }
    spark.stop()
  }
}
