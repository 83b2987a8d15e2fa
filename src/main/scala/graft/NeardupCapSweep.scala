package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Places `StreamQueries.NeardupCapC` with a measured ladder — the
  * FanoutSweep pattern applied to the streaming admission cap (round-15
  * "what's wrong" #4: the constant was a one-point value; the trade it
  * buys — a cap-straddling GENUINE near-dup bucket goes dead for the
  * stream's life vs the clique-quadratic verify mass the cap bounds —
  * had no measurement).
  *
  * Design: a synthetic corpus with PLANTED near-dup clusters whose
  * corpus-side band-bucket occupancies straddle every rung. Five tiers
  * with corpus-members/stream-members per cluster of (3/1, 9/3, 30/10,
  * 120/40, 480/160) and cluster counts chosen so each tier carries the
  * SAME total corpus mass (~7.7k docs) and the same stream mass
  * (~2.56k docs); expected per-band corpus occupancy ≈ 0.9 × members =
  * {2.7, 8, 27, 108, 432}, interleaving the rungs {4, 16, 64, 256}.
  * Every cluster member is the 60-word base text with exactly ONE
  * word replaced (3-shingle Jaccard vs base ≈ 55/61 ≈ 0.90 > the 0.8
  * verify threshold), so every planted stream doc IS a genuine
  * near-dup of corpus content — recall is exact by construction.
  * Background docs (8k corpus / 2k stream, all unique) pin the
  * false-dup side.
  *
  * Per rung C ∈ {4, 16, 64, 256, uncapped}: build the hot set at C
  * (corpus occupancy > C, exactly st8c's build-time rule), time the
  * PROBE (StreamingOps.neardupAdmitCapped — the per-batch cost the cap
  * governs; index build is offline) with warmup + min-of-two, and
  * record recall over planted stream docs, false dups over background,
  * candidate-pair count (the quadratic mass proxy), dead buckets, and
  * the stage-level peak/spill the SpillSweep listener records.
  *
  * Usage: runMain graft.NeardupCapSweep [outJson]
  */
object NeardupCapSweep {

  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9E3779B97F4A7C15L + b
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  private val Words = 60
  private val Vocab = 5000

  // (corpus members, stream members, clusters) per tier — equal corpus
  // mass per tier, occupancies straddling the rungs
  private val Tiers = Seq((3, 1, 2560), (9, 3, 853), (30, 10, 256),
    (120, 40, 64), (480, 160, 16))
  private val Caps = Seq(4L, 16L, 64L, 256L)

  final case class Doc(doc_id: Long, text: String, tier: Int,
      cluster: Long, stream: Boolean)

  private def clusterText(cluster: Long, variant: Int): String = {
    val base = (0 until Words).map(i => "w" + (mix(cluster, i.toLong) % Vocab))
    if (variant == 0) base.mkString(" ")
    else {
      // exactly one word replaced, position variant-dependent, token
      // globally unique to this (cluster, variant)
      val p = (mix(cluster, 1000003L + variant) % Words).toInt
      base.updated(p, s"u${cluster}x$variant").mkString(" ")
    }
  }

  def plantedDocs(): Seq[Doc] = {
    val out = Seq.newBuilder[Doc]
    var corpusId = 0L            // corpus ids in [0, 1e6)
    var streamId = 1000000L      // stream ids disjoint above
    var cluster = 0L
    for (((cm, sm, n), tier) <- Tiers.zipWithIndex; _ <- 0 until n) {
      for (v <- 0 until cm) {
        out += Doc(corpusId, clusterText(cluster, v), tier, cluster, stream = false)
        corpusId += 1
      }
      for (v <- cm until cm + sm) {
        out += Doc(streamId, clusterText(cluster, v), tier, cluster, stream = true)
        streamId += 1
      }
      cluster += 1
    }
    // unique background: 60 words drawn from a doc-keyed space no
    // cluster text can collide with
    for (i <- 0 until 8000) {
      out += Doc(corpusId, (0 until Words)
        .map(j => s"bg${corpusId}_${mix(corpusId, j.toLong) % 100000}").mkString(" "),
        -1, -1L, stream = false)
      corpusId += 1
    }
    for (i <- 0 until 2000) {
      out += Doc(streamId, (0 until Words)
        .map(j => s"bg${streamId}_${mix(streamId, j.toLong) % 100000}").mkString(" "),
        -1, -1L, stream = true)
      streamId += 1
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.create("graft-neardupcap-sweep", cpus)
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

    val docs = spark.createDataFrame(plantedDocs()).repartition(32)
      .persist()
    val nPlantedStream = docs.filter($"stream" && $"tier" >= 0).count()
    val nBgStream = docs.filter($"stream" && $"tier" < 0).count()
    println(s"[capsweep] docs=${docs.count()} plantedStream=$nPlantedStream " +
      s"bgStream=$nBgStream")

    // BUILD-time tables (offline at 100 TB): corpus shingles + bands,
    // materialized once, shared by every rung
    val corpus = docs.filter(!$"stream").select($"doc_id", $"text")
    val stream = docs.filter($"stream").select($"doc_id", $"text")
    val sids = DedupQueries.shingleTableOf(corpus).persist()
    val corpusBands = DedupQueries.bandIndex(sids.filter(size($"sid") > 0))
      .persist()
    val bSids = DedupQueries.shingleTableOf(stream).persist()
    sids.count(); corpusBands.count(); bSids.count()

    def runRung(cap: Option[Long]): (Double, Long, Long, Long, Long, Long, Long) = {
      val hot = cap.map { c =>
        corpusBands.groupBy($"band_idx", $"band_hash")
          .agg(count(lit(1)).as("n")).filter($"n" > c)
          .select($"band_idx", $"band_hash").persist()
      }
      val deadBuckets = hot.map(_.count()).getOrElse(0L)
      val bands = hot.fold(corpusBands)(h =>
        corpusBands.join(h, Seq("band_idx", "band_hash"), "left_anti"))
        .persist()
      bands.count()
      def decide(): DataFrame = hot match {
        case Some(h) => streaming.StreamingOps.neardupAdmitCapped(bSids, sids, bands, h)
        case None    => streaming.StreamingOps.neardupAdmit(bSids, sids, bands)
      }
      def once(): Double = {
        val t0 = System.nanoTime()
        decide().foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      memSpilled.set(0L); peakExec.set(0L)
      val secs = math.min(once(), once())
      // decisions for quality metrics (outside the timed window)
      val dec = decide().persist()
      val caught = dec.join(docs.select($"doc_id", $"tier"), "doc_id")
        .filter($"tier" >= 0 && !$"admitted").count()
      val falseDups = dec.join(docs.select($"doc_id", $"tier"), "doc_id")
        .filter($"tier" < 0 && !$"admitted").count()
      // candidate-pair mass: the quantity the cap exists to bound
      val probe0 = DedupQueries.bandIndex(bSids.filter(size($"sid") > 0))
      val probe = hot.fold(probe0)(h =>
        probe0.join(h, Seq("band_idx", "band_hash"), "left_anti"))
      val candPairs = probe.as("n").join(bands.as("o"),
          col("n.band_idx") === col("o.band_idx") &&
            col("n.band_hash") === col("o.band_hash"))
        .select(col("n.doc_id"), col("o.doc_id")).distinct().count()
      dec.unpersist(); bands.unpersist(); hot.foreach(_.unpersist())
      (secs, caught, falseDups, candPairs, deadBuckets,
        memSpilled.get, peakExec.get)
    }

    val rungs = Caps.map(c => (c.toString, runRung(Some(c)))) :+
      ("uncapped", runRung(None))
    rungs.foreach { case (name, (s, caught, fd, cp, db, sp, pk)) =>
      println(f"[capsweep] cap=$name%-8s probe=$s%6.2f s  " +
        f"recall=${caught * 1000 / nPlantedStream}%4d/1000  falseDups=$fd  " +
        f"candPairs=$cp%8d  deadBuckets=$db%5d  peakExec=${pk / 1e6}%.0fMB")
    }

    outJson.foreach { path =>
      def num(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val qs = rungs.map { case (name, (s, caught, fd, cp, db, sp, pk)) =>
        s""""$name":{"probe_secs":${num(s)},""" +
          s""""recall_milli":${caught * 1000 / nPlantedStream},""" +
          s""""caught":$caught,"false_dups":$fd,"cand_pairs":$cp,""" +
          s""""dead_buckets":$db,"mem_spilled_bytes":$sp,""" +
          s""""peak_exec_mem_bytes":$pk}"""
      }.mkString(",")
      val tiers = Tiers.map { case (cm, sm, n) =>
        s"""{"corpus_members":$cm,"stream_members":$sm,"clusters":$n}"""
      }.mkString("[", ",", "]")
      val doc = s"""{"cpus":$cpus,"planted_stream_docs":$nPlantedStream,""" +
        s""""bg_stream_docs":$nBgStream,"tiers":$tiers,""" +
        s""""caps":{$qs}}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc)
      println(s"[capsweep] artifact written: $path")
    }
    spark.stop()
  }
}
