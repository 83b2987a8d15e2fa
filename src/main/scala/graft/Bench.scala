package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times the headline query set (bench-flagged in
  * the registry — one per operator family: scan-agg, join-agg, window,
  * LSH dedup, vector search, iterative CC, query language, event-time
  * window) and prints ONE JSON line. count() forces full execution
  * without collecting rows to the driver.
  *
  * Reproducibility: each query runs a warmup pass immediately before its
  * timed passes (JIT + codegen compiled, its substrate/index tables
  * materialized — index builds are offline in production) and the cache
  * is CLEARED after each query finishes. A single global warmup pass was
  * tried and rejected: materializing every query's persisted substrate
  * up front overflows the storage pool, and later queries silently
  * recompute evicted caches — an 18-key run inflated individual keys up
  * to 20× (d18 0.9 s isolated → 20.4 s pooled). Per-query lifecycle
  * keeps each measurement equal to its isolated best-of-runs. Each query
  * is timed TWICE and the minimum reported — the best observation is the
  * standard contention-robust estimator for a shared machine (a single
  * noisy-neighbor spike would otherwise poison the round's numbers).
  * If the two passes disagree by more than 1.5x the machine was
  * contended for at least one of them, so a third tie-break pass runs
  * and the minimum of the three is reported.
  * Failures are loud: a failing query is reported as "err" with the
  * exception recorded, the headline total becomes -1, and the process
  * exits nonzero — a broken query can never read as a speedup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.create("graft-bench", cpus)
    val fns = Queries.queries
    // optional comma-separated filter for local single-query timing; the
    // driver never sets it, so recorded rounds always cover the full set
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val benchNames = Queries.benchNames
      .filter(n => only.forall(_.contains(n)))
    // a typo'd or empty filter must not print a green 0.000s total
    only.foreach { names =>
      val unknown = names -- Queries.benchNames.toSet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not bench-flagged: ${unknown.mkString(", ")}")
    }
    require(benchNames.nonEmpty, "bench filter matched no queries")
    def timeOnce(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fns(name)(spark, sfDir).count()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        Left(e.toString.linesIterator.next().take(160))
      }
    }
    // the full per-key protocol, shared by BOTH phases: warmup + two
    // timed passes + a tie-break pass when they disagree by >1.5x
    def bestOf(name: String): Either[String, Double] = {
      // per-query warmup (JIT + this query's substrate only)
      try fns(name)(spark, sfDir).count()
      catch { case _: Throwable => () } // surfaced by the timed pass below
      val r = (timeOnce(name), timeOnce(name)) match {
        case (Right(a), Right(b)) =>
          val lo = math.min(a, b)
          if (math.max(a, b) > lo * 1.5)
            // tie-break pass: a transient failure must not discard the
            // two good measurements — fall back to their min
            Right(timeOnce(name).fold(_ => lo, c => math.min(lo, c)))
          else Right(lo)
        case (e @ Left(_), _) => e
        case (_, e) => e
      }
      // drop this query's persisted substrate before the next key so
      // measurements never depend on key-set size or run order
      spark.catalog.clearCache()
      r
    }
    val results: Seq[(String, Either[String, Double])] =
      benchNames.map(name => name -> bestOf(name))
    // JSON demands '.' decimal separators; f"" uses the JVM default
    // locale, which on comma-separator locales would emit invalid JSON
    def num3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map {
      case (k, Right(v)) => "\"" + k + "\":" + num3(v)
      case (k, Left(_))  => "\"" + k + "\":\"err\""
    }.mkString("{", ",", "}")
    // isolated best-of: single recordings on a shared sandbox are noisy
    // at the ±10% level round-over-round comparison needs (r10's
    // recorded-vs-quiet gap was 27.4 vs 24.1 s). After the sweep — JVM
    // fully warm, no sweep neighbors — re-time EVERY key once more and
    // report min(recorded, post-run pass) alongside the recorded
    // numbers, so a reader can adjudicate any per-key delta as plan
    // regression vs environment noise without re-running by hand (the
    // round-12 verdict: a 5-key subset left the regressed keys
    // unadjudicated in the artifact of record).
    // same full protocol as the recorded phase — the round-14 verdict
    // found five keys with isolated_best == recorded because this phase
    // ran a SINGLE timed pass (one contended observation loses to the
    // recorded min and the key reads as never isolated); two passes +
    // tie-break make the isolated number a real best-of measurement
    val isolated = results.collect { case (k, Right(v)) => (k, v) }
      .map { case (k, rec) =>
        k -> bestOf(k).fold(_ => rec, v => math.min(rec, v))
      }
    val iso = isolated.map { case (k, v) => "\"" + k + "\":" + num3(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(e)) =>
      "\"" + (k + ": " + e).replace("\\", "\\\\").replace("\"", "'") + "\"" }
    val total = if (errs.nonEmpty) -1.0
      else results.collect { case (_, Right(v)) => v }.sum
    val errField = if (errs.isEmpty) "" else s""","errors":[${errs.mkString(",")}]"""
    println(s"""{"metric":"total","value":${num3(total)},"unit":"sec","queries":$qs,"isolated_best":$iso$errField,"sf":"$sfDir"}""")
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
