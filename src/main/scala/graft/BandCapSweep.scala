package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Places the BATCH hot-band guard `DedupQueries.BandCap` with a
  * measured ladder — the FanoutSweep/NeardupCapSweep pattern applied to
  * the last one-point guard constant, motivated by the round-16 sf100
  * probe: 1000-copy cliques sitting just UNDER the 1024 default kept
  * every bucket alive and made d2's verify mass quadratic
  * (STRESS_sf100_r16.json adjudication).
  *
  * Design: one batch corpus with PLANTED genuine near-dup clusters
  * whose sizes straddle every rung. Five tiers of (members, clusters) =
  * (20,320) (100,64) (400,16) (1600,4) (6400,1) — each tier carries the
  * SAME total mass (6,400 docs) so per-tier recall is comparable; every
  * member is the 60-word cluster base with exactly ONE word replaced
  * (pairwise 3-shingle Jaccard ≥ 52/64 ≈ 0.81 > the 0.8 verify
  * threshold, so every same-cluster pair is a genuine near-dup by
  * construction). Expected band-bucket occupancy ≈ 0.8 × members
  * (P(band agrees) ≈ jacc² per 2-row band) = {16, 80, 320, 1280, 5120},
  * interleaving the rungs {64, 256, 1024, 4096}. 8,000 unique
  * background docs pin the false-pair side.
  *
  * Per rung: set `spark.graft.bandCap`, run the FULL d2 core
  * (DedupQueries.minhashVerified — band join through Jaccard verify)
  * with warmup + min-of-two, then record per-tier doc recall (a doc
  * counts as caught when it appears in ≥1 same-cluster verified pair —
  * the removable-duplicate reading), verified same-cluster pairs,
  * false pairs (cross-cluster or background), candidate-pair mass (the
  * quadratic term the cap bounds), dropped buckets, and stage-level
  * peak/spill.
  *
  * Usage: runMain graft.BandCapSweep [outJson]
  */
object BandCapSweep {

  /** Block until the async listener bus has delivered all posted stage
    * events, so counter reads see every event from the jobs that ran
    * before the call. `LiveListenerBus.waitUntilEmpty` is
    * `private[spark]` (bytecode-public), reached via reflection; on any
    * surprise we fall back to a settle-sleep, which only widens the
    * snapshot window — never narrows it. */
  private def drainListeners(spark: org.apache.spark.sql.SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      ()
    } catch { case _: Throwable => Thread.sleep(1000) }

  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9E3779B97F4A7C15L + b
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  private val Words = 60
  private val Vocab = 5000

  // (members, clusters) per tier — equal mass, occupancies straddling
  // the rungs
  private val Tiers = Seq((20, 320), (100, 64), (400, 16), (1600, 4), (6400, 1))
  private val Caps = Seq(64L, 256L, 1024L, 4096L)

  final case class Doc(doc_id: Long, text: String, tier: Int, cluster: Long)

  private def clusterText(cluster: Long, variant: Int): String = {
    val base = (0 until Words).map(i => "w" + (mix(cluster, i.toLong) % Vocab))
    val p = (mix(cluster, 1000003L + variant) % Words).toInt
    base.updated(p, s"u${cluster}x$variant").mkString(" ")
  }

  def plantedDocs(): Seq[Doc] = {
    val out = Seq.newBuilder[Doc]
    var id = 0L
    var cluster = 0L
    for (((m, n), tier) <- Tiers.zipWithIndex; _ <- 0 until n) {
      for (v <- 0 until m) {
        out += Doc(id, clusterText(cluster, v), tier, cluster)
        id += 1
      }
      cluster += 1
    }
    for (_ <- 0 until 8000) {
      out += Doc(id, (0 until Words)
        .map(j => s"bg${id}_${mix(id, j.toLong) % 100000}").mkString(" "),
        -1, -1L)
      id += 1
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.create("graft-bandcap-sweep", cpus)
    import spark.implicits._

    val memSpilled = new AtomicLong
    val peakExec = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled)
          peakExec.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
          ()
        }
      }
    })

    val docs = spark.createDataFrame(plantedDocs()).repartition(32).persist()
    val meta = docs.select($"doc_id", $"tier", $"cluster").persist()
    val tierSizes = Tiers.zipWithIndex
      .map { case ((m, n), t) => t -> m.toLong * n }.toMap
    println(s"[bandcap] docs=${docs.count()} planted=${tierSizes.values.sum}")

    // the shingle table is cap-independent: built once, shared by rungs
    val base = DedupQueries
      .shingleTableOf(docs.select($"doc_id", $"text"))
      .filter(size($"sid") > 0).persist()
    base.count()

    def runRung(cap: Option[Long])
        : (Double, Long, Seq[(Int, Long, Long)], Long, Long, Long, Long, Long) = {
      spark.conf.set("spark.graft.bandCap",
        cap.getOrElse(1000000000L).toString)
      def once(): Double = {
        val t0 = System.nanoTime()
        DedupQueries.minhashVerified(base).foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      spark.catalog.clearCache() // drop the warmup's internal substrates
      drainListeners(spark) // let the warmup's stage events land first
      memSpilled.set(0L); peakExec.set(0L)
      val drops0 = DedupQueries.guardDropCount.get()
      val secs = { val a = once(); spark.catalog.clearCache()
        val b = once(); math.min(a, b) }
      val dropped = (DedupQueries.guardDropCount.get() - drops0) / 2 // two passes
      // snapshot the memory counters NOW — after draining the listener
      // bus, before the untimed quality-metric jobs below pollute them
      drainListeners(spark)
      val spilledSnap = memSpilled.get
      val peakSnap = peakExec.get
      // quality metrics outside the timed window
      val pairs = DedupQueries.minhashVerified(base)
        .join(meta.select($"doc_id".as("doc_a"),
          $"tier".as("tier_a"), $"cluster".as("cluster_a")), "doc_a")
        .join(meta.select($"doc_id".as("doc_b"),
          $"tier".as("tier_b"), $"cluster".as("cluster_b")), "doc_b")
        .persist()
      val good = pairs.filter($"tier_a" >= 0 && $"cluster_a" === $"cluster_b")
        .persist()
      val falsePairs = pairs.count() - good.count()
      val perTier = Tiers.indices.map { t =>
        val g = good.filter($"tier_a" === t)
        val caught = g.select(explode(array($"doc_a", $"doc_b")).as("d"))
          .distinct().count()
        (t, caught, g.count())
      }
      // candidate mass — the quadratic term the cap exists to bound
      val bandRows = DedupQueries.bandIndex(base)
      val cand = DedupQueries.guardedBandPairs(
        bandRows, Seq("band_idx", "band_hash"), "doc_id").count()
      pairs.unpersist(); good.unpersist()
      spark.catalog.clearCache()
      val goodPairs = perTier.map(_._3).sum
      (secs, goodPairs, perTier, falsePairs, cand, dropped,
        spilledSnap, peakSnap)
    }

    val rungs = Caps.map(c => (c.toString, runRung(Some(c)))) :+
      ("uncapped", runRung(None))
    rungs.foreach { case (name, (s, gp, perTier, fp, cand, db, _, pk)) =>
      val rec = perTier.map { case (t, caught, _) =>
        s"t$t=${caught * 1000 / tierSizes(t)}" }.mkString(" ")
      println(f"[bandcap] cap=$name%-8s verify=$s%7.2f s  goodPairs=$gp%9d  " +
        f"recall‰[$rec]  false=$fp  candPairs=$cand%9d  dropped=$db%4d  " +
        f"peakExec=${pk / 1e6}%.0fMB")
    }

    outJson.foreach { path =>
      def num(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val qs = rungs.map { case (name, (s, gp, perTier, fp, cand, db, sp, pk)) =>
        val tiers = perTier.map { case (t, caught, g) =>
          s""""t$t":{"members":${Tiers(t)._1},""" +
            s""""recall_milli":${caught * 1000 / tierSizes(t)},""" +
            s""""caught_docs":$caught,"pairs":$g}"""
        }.mkString(",")
        s""""$name":{"verify_secs":${num(s)},"good_pairs":$gp,""" +
          s""""false_pairs":$fp,"cand_pairs":$cand,""" +
          s""""dropped_buckets":$db,"mem_spilled_bytes":$sp,""" +
          s""""peak_exec_mem_bytes":$pk,"tiers":{$tiers}}"""
      }.mkString(",")
      val tiers = Tiers.map { case (m, n) =>
        s"""{"members":$m,"clusters":$n}""" }.mkString("[", ",", "]")
      val doc = s"""{"cpus":$cpus,"planted_docs":${tierSizes.values.sum},""" +
        s""""bg_docs":8000,"tiers":$tiers,"caps":{$qs}}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc)
      println(s"[bandcap] artifact written: $path")
    }
    spark.stop()
  }
}
