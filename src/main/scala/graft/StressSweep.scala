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
  * order), which collapses the clique, and each has a bounded-output
  * `*b` twin in the registry that measures its cost instead of paying
  * it. A timeout is reported loudly (never silently skipped) with that
  * contract note.
  *
  * ARTIFACT: with a third argument the sweep persists machine-readable
  * results (per-key seconds, status + contract note, guardedBandPairs
  * drop counts) so rounds can diff scaling the way BENCH_r*.json diffs
  * wall-times; with a fourth argument (a prior artifact, e.g. an sf0.1
  * run) each key also carries `ratio` = this run's seconds over the
  * baseline's.
  *
  * Usage: runMain graft.StressSweep [sfDir] [timeoutSecs] [outJson [baselineJson]]
  */
object StressSweep {
  final private case class Res(secs: Double, status: String, note: String,
      guardDrops: Long, dropsTainted: Boolean = false)

  /** Keys whose sf1/sf0.1 ratio is super-linear BY CONTRACT — the note
    * rides the artifact so a round-over-round ratio diff reads the why
    * without re-deriving it (a ratio ≈ 10 is plain linear compute at
    * 10× data; only ratios well past 10 need a reason). */
  private val contractNotes: Map[String, String] = Map(
    "v13_bitext_margin" -> ("exact all-pairs margin baseline (the " +
      "oracle-checkable brute, v1-style): cost is |en|x|xx| by contract; " +
      "v13b is the LSH-candidate production path"),
    "v17_bitext_recall" -> ("recall eval against the exact all-pairs " +
      "truth — inherits v13's quadratic contract on the truth side"),
    "d5_embedding_neardup" -> ("output grows with genuine near-dup " +
      "pairs (874 -> 177k on the clique corpus) — output-bound, not a " +
      "scaling defect"),
    "d9_semantic_prune" -> ("per-cell self-join is sum(m_c^2) with the " +
      "fixture's FIXED K; deployment grows K ~ sqrt(N) to keep cells " +
      "constant-sized (SemDeDup shape)"),
    "d17_embed_decontaminate" -> ("corpus x benchmark product: the " +
      "fixture scales BOTH sides 10x; production holds the benchmark " +
      "side fixed, making the scan linear"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_stress/sf1")
    val timeoutSecs = args.lift(1).map(_.toLong).getOrElse(300L)
    val outJson = args.lift(2)
    val baseline: Map[String, Double] = args.lift(3).map { p =>
      import org.json4s._
      val root = jackson.JsonMethods.parse(
        java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
      (root \ "queries") match {
        case JObject(fields) => fields.collect {
          case (name, q: JObject) => (q \ "secs") match {
            case JDouble(s) => Some(name -> s)
            case JInt(s) => Some(name -> s.toDouble)
            case _ => None
          }
        }.flatten.toMap
        case _ => Map.empty[String, Double]
      }
    }.getOrElse(Map.empty)
    val spark = Sessions.create("graft-stress-sweep",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // env-conf passthrough (round-16 verdict item 5): a sweep variant
    // under a session knob — e.g. SPARK_GRAFT_SWEEP_CONF=
    // "spark.graft.bandCap=256" for the capped-d2 sf100 rung — runs
    // through the SAME harness instead of a one-off main, and the
    // artifact stamps exactly what was set ("env_conf") so the rung is
    // comparable to the default-knob artifact it sits beside
    val envConf: Seq[(String, String)] = sys.env.get("SPARK_GRAFT_SWEEP_CONF")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        .map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"SPARK_GRAFT_SWEEP_CONF entry not k=v: $kv")
          (kv.take(i), kv.drop(i + 1))
        }).getOrElse(Seq.empty)
    envConf.foreach { case (k, v) =>
      spark.conf.set(k, v)
      println(s"[sweep] env conf: $k=$v")
    }
    // local-iteration filter (comma-separated); the driver never sets
    // it, so recorded sweeps always cover the full registry
    val only = sys.env.get("SPARK_GRAFT_SWEEP_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    var failed = List.empty[String]
    var timedOut = List.empty[String]
    // zombie futures: timed-out queries whose future did not drain in
    // its 60 s window keep mutating the process-global guardDropCount —
    // while any is live, later keys' drop deltas are flagged tainted
    // instead of silently misattributed
    var zombies = List.empty[Future[String]]
    val sweepSet = Queries.all.filter(q => only.forall(_.contains(q.name)))
    only.foreach { names =>
      val unknown = names -- Queries.all.map(_.name).toSet
      require(unknown.isEmpty, s"SPARK_GRAFT_SWEEP_ONLY unknown: ${unknown.mkString(",")}")
    }
    val results: Seq[(String, Res)] = sweepSet.map { q =>
      zombies = zombies.filterNot(_.isCompleted)
      val t0 = System.nanoTime()
      val drops0 = DedupQueries.guardDropCount.get()
      val group = s"sweep-${q.name}"
      val fut = Future {
        spark.sparkContext.setJobGroup(group, q.name, interruptOnCancel = true)
        try { q.fn(spark, sfDir).foreach(_ => ()); "ok" }
        finally spark.sparkContext.clearJobGroup()
      }
      val (status, note) = try {
        (Await.result(fut, timeoutSecs.seconds),
          contractNotes.getOrElse(q.name, ""))
      }
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
            zombies ::= fut
          }
          timedOut ::= q.name
          ("timeout", s">${timeoutSecs}s; if a pair-lister: output is " +
            "quadratic in dup-clique size by contract — compose after " +
            "exact dedup, or read its bounded *b twin")
        case e: Throwable =>
          failed ::= q.name
          ("fail",
            String.valueOf(e.getMessage).linesIterator.next().take(120))
      }
      spark.catalog.clearCache()
      val secs = (System.nanoTime() - t0) / 1e9
      val drops = DedupQueries.guardDropCount.get() - drops0
      val tainted = drops > 0 && zombies.exists(!_.isCompleted)
      val extra = (if (drops > 0) s"  [guard drops: $drops" +
          (if (tainted) ", TAINTED by a live zombie future]" else "]")
        else "") +
        (if (note.nonEmpty) s"  $note" else "")
      println(f"[sweep] ${q.name}%-28s $secs%7.2f s  $status$extra")
      q.name -> Res(secs, status, note, drops, tainted)
    }
    // isolated re-measurement of ratio-flag suspects — the manual
    // adjudication protocol every round applied by hand (r12 d5, r15
    // st6/st8b, r16 j8/a6 all recovered in isolated re-runs),
    // mechanized: any ok key whose seconds grew >1.5× over the
    // baseline artifact re-runs once AFTER the sweep (JVM warm, no
    // sweep neighbors) and the artifact records both numbers, so
    // tools/stress_diff.py and any reader can separate sweep-neighbor
    // JVM state from a real regression without a hand re-run. The
    // isolated number never OVERWRITES the recorded one — both ride
    // the artifact.
    val isoSecs: Map[String, Double] = results.collect {
      case (name, r) if r.status == "ok" &&
          baseline.get(name).exists(b => b > 0 && r.secs > b * 1.5) =>
        val fn = sweepSet.find(_.name == name).get.fn
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).foreach(_ => ()); true }
          catch { case _: Throwable => false }
        spark.catalog.clearCache()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[sweep] iso re-run ${name}%-26s $s%7.2f s" +
          (if (ok) "" else "  (failed isolated; not recorded)"))
        if (ok) Some(name -> s) else None
    }.flatten.toMap
    val total = results.map(_._2.secs).sum
    val slowest = results.sortBy(-_._2.secs).take(10)
      .map { case (n, r) => f"$n=${r.secs}%.1f" }.mkString(", ")
    println(f"[sweep] TOTAL ${results.size} queries $total%.1f s; slowest: $slowest")
    if (timedOut.nonEmpty)
      println(s"[sweep] TIMED OUT (reported, not silent): ${timedOut.reverse.mkString(", ")}")
    outJson.foreach { path =>
      // JSON demands '.' decimal separators; f"" uses the JVM default
      // locale, which on comma-separator locales would emit invalid JSON
      def num(fmt: String, v: Double): String =
        String.format(java.util.Locale.ROOT, fmt, Double.box(v))
      def q(s: String): String = "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      val rows = results.map { case (name, r) =>
        val ratio = baseline.get(name).filter(_ > 0)
          .map(b => s""","ratio":${num("%.2f", r.secs / b)}""").getOrElse("")
        val note = if (r.note.nonEmpty) s""","note":${q(r.note)}""" else ""
        val drops = if (r.guardDrops > 0) s""","guard_drops":${r.guardDrops}""" else ""
        val taint = if (r.dropsTainted) s""","drops_tainted":true""" else ""
        val iso = isoSecs.get(name)
          .map(s => s""","iso_secs":${num("%.3f", s)}""").getOrElse("")
        s"""${q(name)}:{"secs":${num("%.3f", r.secs)},"status":${q(r.status)}$ratio$iso$drops$taint$note}"""
      }.mkString(",")
      // env + corpus stamp: a sweep's seconds are only comparable to a
      // prior artifact's under the same heap/threads AND the same
      // corpus draw (the driver regenerates testdata every round, and
      // StressGen corpora derive from it) — record both, same
      // fingerprint as BENCH (Bench.corpusFingerprint), so ratio-flag
      // adjudication reads off the artifacts
      val heapG = Runtime.getRuntime.maxMemory() / (1 << 30)
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val (corpusId, corpusStats) = Bench.corpusFingerprint(spark, sfDir)
      val corpusTables = corpusStats.map { case (n, r, b) =>
        s"""${q(n)}:{"rows":$r,"bytes":$b}""" }.mkString("{", ",", "}")
      val envConfJson = envConf.map { case (k, v) => s"${q(k)}:${q(v)}" }
        .mkString("{", ",", "}")
      val doc = s"""{"sf_dir":${q(sfDir)},"timeout_secs":$timeoutSecs,""" +
        s""""heap_gib":$heapG,"cpus":$cpus,"env_conf":$envConfJson,""" +
        s""""corpus":{"id":${q(corpusId)},"tables":$corpusTables},""" +
        s""""n_queries":${results.size},"total_secs":${num("%.1f", total)},""" +
        s""""n_timeout":${timedOut.size},"n_fail":${failed.size},""" +
        s""""queries":{$rows}}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc)
      println(s"[sweep] artifact written: $path")
    }
    if (failed.nonEmpty) {
      println(s"[sweep] FAILED: ${failed.reverse.mkString(", ")}")
      spark.stop(); sys.exit(1)
    }
    spark.stop()
  }
}
