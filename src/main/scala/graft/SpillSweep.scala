package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** The memory-pressure (spill) regime sweep — the 100-TB execution
  * dimension the 128 GiB sandbox never exercises on its own: on a real
  * cluster a heavy stage's shuffle and aggregation state EXCEEDS the
  * executor's execution-memory pool and must spill to disk; an operator
  * that only works because everything fit in RAM (a driver-side
  * materialization, an unbounded hash state, a persist() sized to the
  * corpus) dies there and nowhere else. The round-13 sf10 sweep caught
  * exactly one such defect class (a 99M-item driver Seq) — this sweep
  * makes the regime reproducible instead of accidental.
  *
  * Mechanics: the JVM heap stays at the sbt default (8 GiB via
  * SPARK_DRIVER_MEM) and `spark.memory.fraction` is lowered to 0.15, so
  * the unified execution+storage pool is ~1.1 GiB shared by 32 task
  * threads (~35 MB each) while the sf10 corpus carries ~60M lineitem
  * rows — every heavy shuffle/aggregation/sort is forced past its
  * in-memory budget and through the spill path (UnsafeExternalSorter /
  * ExternalAppendOnlyUnsafeRowArray), and MEMORY_AND_DISK persists
  * overflow to disk blocks instead of evicting silently.
  *
  * A stage-completion listener aggregates memoryBytesSpilled /
  * diskBytesSpilled / peakExecutionMemory per query (the driver-visible
  * proof the regime actually engaged — a sweep that "passes" with zero
  * spill just wasn't under pressure), and the artifact records them per
  * key next to seconds + status.
  *
  * Done-criterion (round-14 verdict item 1): every key completes, spill
  * is NONZERO, no OOM.
  *
  * Usage: runMain graft.SpillSweep [sfDir] [outJson] [key,key,...]
  */
object SpillSweep {
  private val HeavyKeys = Seq(
    "la_build_pipeline", "la_daily_run", "t_corpus_pipeline",
    "j6_reconcile_fixpoint", "g1_connected_components",
    "d2_minhash_lsh", "k2_nt_triples",
    // the streaming admission's production (capped) path — in the
    // default battery since round 15's tier-3 finding; the uncapped
    // st8 stays out (contract-quadratic, OOMs the regime by design)
    "st8c_stream_admit_capped")

  /** The registry's contract-quadratic pair-listers (the standing six
    * sf1 StressSweep timeouts, each with a bounded `*b`/capped twin):
    * their cost is quadratic in dup-clique size BY CONTRACT, and under
    * this sweep's starved pool that contract is a JVM-killing executor
    * OOM, not a measurement (round-15: uncapped st8 killed three sweep
    * JVMs). A battery that names one gets a recorded skip unless
    * `SPARK_GRAFT_CONTRACT_KEYS=run` forces it — and forced contract
    * keys run LAST, so a kill can only lose its own measurement (the
    * per-key artifact rewrite preserves everything before it). */
  private val ContractQuadraticKeys = Set(
    "j17_fuzzy_join", "d4_ngram_jaccard", "d19_lsh_recall_eval",
    "d13_winnow_dedup", "st8_stream_neardup", "m1v_image_neardup")

  final private case class Res(secs: Double, status: String,
      memSpilled: Long, diskSpilled: Long, spillStages: Int,
      peakExecMem: Long, note: String)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_stress/sf10")
    val outJson = args.lift(1)
    val requested = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(HeavyKeys)
    // contract fence (round-15 verdict item 6): a named contract-
    // quadratic key is SKIPPED (recorded in the artifact, loud on
    // stdout) unless SPARK_GRAFT_CONTRACT_KEYS=run; forced ones run
    // LAST so a JVM-killing OOM loses only its own measurement
    val runContract =
      sys.env.get("SPARK_GRAFT_CONTRACT_KEYS").exists(_.equalsIgnoreCase("run"))
    val (contractKeys, plainKeys) = requested.partition(ContractQuadraticKeys)
    val skippedContract = if (runContract) Seq.empty else contractKeys
    val keys = if (runContract) plainKeys ++ contractKeys else plainKeys
    skippedContract.foreach(k => println(s"[spill] SKIP $k — " +
      "contract-quadratic pair-lister (JVM-killing OOM under this " +
      "regime by contract); set SPARK_GRAFT_CONTRACT_KEYS=run to force"))
    val fraction = sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.15")
    // storageFraction was round 14's FIRST hypothesis for the la_build/
    // j6 UNABLE_TO_ACQUIRE_MEMORY (half the squeezed pool eviction-
    // protected as cache) — DISPROVEN by the 0.1 re-run, which fails
    // identically. The real mechanism (log-proven: a wall of
    // "Not enough space to cache rdd_N in memory! (computed 64.1 MiB so
    // far)" 8 s before the OOM): the failing stage MATERIALIZES a
    // MEMORY_AND_DISK substrate while aggregating, so all 32 tasks hold
    // in-progress UNROLL reservations — storage-side memory that is not
    // evictable at ANY storageFraction while the unroll is running — and
    // the same tasks' hash-aggregate first page finds a zero-free pool.
    // The knob that owns this regime is the CACHE STORAGE LEVEL:
    // DISK_ONLY skips the MemoryStore (no unroll reservation at all), so
    // execution keeps the whole pool. Both knobs stay recorded in the
    // artifact; both regimes are worth keeping reproducible.
    val storageFraction =
      sys.env.getOrElse("SPARK_GRAFT_STORAGE_FRACTION", "0.5")
    // spark.sql.defaultCacheStorageLevel rewrites every no-arg
    // Dataset.persist()/cache() in the engine — pure cluster conf, zero
    // operator-code involvement, exactly what a pressure deployment sets.
    val cacheLevel =
      sys.env.getOrElse("SPARK_GRAFT_CACHE_LEVEL", "MEMORY_AND_DISK")
    // the ENGINE-OWNED regime knob (round-15): operators.Substrate routes
    // every fixpoint-substrate persist through
    // spark.graft.substrateStorageLevel, so a pressure profile sets ONE
    // graft key instead of rewriting every persist() in the app via
    // spark.sql.defaultCacheStorageLevel. The sweep records BOTH knobs so
    // the artifact says which one produced it.
    val substrateLevel =
      sys.env.getOrElse("SPARK_GRAFT_SUBSTRATE_LEVEL", "MEMORY_AND_DISK")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.create("graft-spill-sweep", cpus, Map(
      // the squeeze: unified pool = (heap - 300MB reserved) * fraction
      "spark.memory.fraction" -> fraction,
      "spark.memory.storageFraction" -> storageFraction,
      "spark.sql.defaultCacheStorageLevel" -> cacheLevel,
      "spark.graft.substrateStorageLevel" -> substrateLevel,
      // no in-memory shuffle shortcut: every shuffle write goes through
      // the sorter's spill machinery at this pool size anyway; keep AQE
      // on — runtime coalescing under pressure is part of the regime
      "spark.sql.adaptive.enabled" -> "true"))
    val unknown = keys.toSet -- Queries.all.map(_.name).toSet
    require(unknown.isEmpty, s"unknown keys: ${unknown.mkString(",")}")
    val fns = Queries.all.map(q => q.name -> q.fn).toMap

    val memSpilled = new AtomicLong
    val diskSpilled = new AtomicLong
    val spillStages = new AtomicLong
    val peakExec = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
          if (m.diskBytesSpilled > 0 || m.memoryBytesSpilled > 0)
            spillStages.incrementAndGet()
          peakExec.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
          ()
        }
      }
    })
    // the listener bus is async: give it a bounded drain window after a
    // query's last job so its stages attribute to the right key (a late
    // event would shift a few MB between adjacent keys — tolerable for
    // an artifact whose reading is "nonzero and completed", but keep the
    // boundary honest for the per-key numbers)
    def drain(): Unit = Thread.sleep(1500)

    var failed = List.empty[String]
    var results = Vector.empty[(String, Res)]

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // the artifact is REWRITTEN after every key: a key that kills the
    // whole JVM (an executor java.lang.OutOfMemoryError in local mode
    // exits the process via SparkUncaughtExceptionHandler — the
    // round-15 st8 finding) must not erase the keys measured before it
    def writeArtifact(): Unit = outJson.foreach { path =>
      val totMem = results.map(_._2.memSpilled).sum
      val totDisk = results.map(_._2.diskSpilled).sum
      val rows = results.map { case (name, r) =>
        val note = if (r.note.nonEmpty) s""","note":${q(r.note)}""" else ""
        s"""${q(name)}:{"secs":${num(r.secs)},"status":${q(r.status)},""" +
          s""""mem_spilled_bytes":${r.memSpilled},""" +
          s""""disk_spilled_bytes":${r.diskSpilled},""" +
          s""""spill_stages":${r.spillStages},""" +
          s""""peak_exec_mem_bytes":${r.peakExecMem}$note}"""
      }.mkString(",")
      val doc = s"""{"sf_dir":${q(sfDir)},""" +
        s""""heap":${q(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))},""" +
        s""""memory_fraction":$fraction,""" +
        s""""storage_fraction":$storageFraction,""" +
        s""""cache_storage_level":${q(cacheLevel)},""" +
        s""""substrate_storage_level":${q(substrateLevel)},"cpus":$cpus,""" +
        s""""n_keys":${results.size},"n_fail":${failed.size},""" +
        s""""skipped_contract":[${skippedContract.map(q).mkString(",")}],""" +
        s""""total_mem_spilled_bytes":$totMem,""" +
        s""""total_disk_spilled_bytes":$totDisk,""" +
        s""""queries":{$rows}}"""
      // temp-then-ATOMIC_MOVE: the failure this rewrite defends against
      // (executor OOM killing the JVM mid-sweep) can land DURING a
      // plain truncate-then-write, leaving a truncated artifact that
      // loses every previously recorded key (advice r15)
      val target = java.nio.file.Paths.get(path)
      val dir = Option(target.toAbsolutePath.getParent)
        .getOrElse(java.nio.file.Paths.get("."))
      val tmp = java.nio.file.Files.createTempFile(dir, ".spill", ".tmp")
      java.nio.file.Files.writeString(tmp, doc)
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    keys.foreach { name =>
      val (m0, d0, s0) = (memSpilled.get, diskSpilled.get, spillStages.get)
      peakExec.set(0L)
      val t0 = System.nanoTime()
      val status = try { fns(name)(spark, sfDir).foreach(_ => ()); "ok" }
        catch { case e: Throwable =>
          failed ::= name
          "fail: " + String.valueOf(e.getMessage).linesIterator.next().take(120)
        }
      val secs = (System.nanoTime() - t0) / 1e9
      // a fatal key (executor OOM shuts the whole local context down)
      // must not abort the sweep loop before the artifact writes —
      // clearCache on a stopped context throws (round-15 streaming
      // sweep: the fail run died here and recorded nothing)
      try { spark.catalog.clearCache(); drain() }
      catch { case _: Throwable => () }
      val r = Res(secs, status, memSpilled.get - m0, diskSpilled.get - d0,
        (spillStages.get - s0).toInt, peakExec.get,
        if (memSpilled.get - m0 == 0 && diskSpilled.get - d0 == 0)
          "no spill — key not memory-bound even at fraction " + fraction
        else "")
      println(f"[spill] $name%-24s ${r.secs}%7.1f s  ${r.status}  " +
        f"mem=${r.memSpilled / 1e6}%.0fMB disk=${r.diskSpilled / 1e6}%.0fMB " +
        f"stages=${r.spillStages} peakExec=${r.peakExecMem / 1e6}%.0fMB")
      results :+= (name -> r)
      writeArtifact()
    }
    val totMem = results.map(_._2.memSpilled).sum
    val totDisk = results.map(_._2.diskSpilled).sum
    println(f"[spill] TOTAL ${results.size} keys, " +
      f"mem spilled ${totMem / 1e9}%.2f GB, disk spilled ${totDisk / 1e9}%.2f GB, " +
      s"fails=${failed.size}")
    outJson.foreach(path => println(s"[spill] artifact written: $path"))
    if (failed.nonEmpty) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
