package graft

import org.apache.spark.sql.functions._

/** Places the knee behind `JoinPlanner.Config.shuffleHashMaxFanout`
  * (round-14 "what's wrong" #3): the constant was set to 32 from ONE
  * measurement at ~2000× fan-out (r2's blocking self-join at sf10,
  * hinted 69-75 s vs unhinted sort-merge 48-63 s); the crossover
  * between 32 and 2048 was unexplored, so a fan-out-64 join might
  * still prefer the hash hint.
  *
  * Design: a synthetic fan-out ladder with FIXED OUTPUT MASS — for
  * fan-out F, both sides carry F rows per key over K = OUT/F² keys, so
  * every rung emits exactly OUT join rows and the only variable is the
  * per-key pair amplification (the thing the knob gates). Each rung is
  * timed twice per strategy (hinted SHUFFLE_HASH vs unhinted, which
  * resolves to sort-merge under preferSortMergeJoin) and the min
  * reported; broadcast is disabled so AQE can't collapse the
  * comparison; the executed join operator is recorded from the plan so
  * a rung can never silently measure the wrong strategy.
  *
  * Usage: runMain graft.FanoutSweep [outJson] [outputMassRows]
  */
object FanoutSweep {
  def main(args: Array[String]): Unit = {
    val outJson = args.headOption
    val outMass = args.lift(1).map(_.toLong).getOrElse(32000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.create("graft-fanout-sweep", cpus, Map(
      // the comparison is SHJ-vs-SMJ; a broadcast rung would measure
      // neither, and AQE's own SHJ conversion would blur the unhinted arm
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"))
    import spark.implicits._

    val fanouts = Seq(8L, 32L, 64L, 128L, 512L, 2048L)

    def side(f: Long, keys: Long, col2: String) =
      spark.range(keys * f).select(
        (col("id") % keys).as("k"),
        (col("id") * 7L % 1000003L).as(col2))

    def time(f: Long, hinted: Boolean): (Double, String) = {
      val keys = math.max(1L, outMass / (f * f))
      val l = side(f, keys, "a")
      val r0 = side(f, keys, "b")
      val j = if (hinted) l.join(r0.hint("SHUFFLE_HASH"), "k")
              else l.join(r0, "k")
      val plan = j.queryExecution.executedPlan.toString
      val op =
        if (plan.contains("ShuffledHashJoin")) "shuffled_hash"
        else if (plan.contains("SortMergeJoin")) "sort_merge"
        else "other"
      def once(): Double = {
        val t0 = System.nanoTime()
        j.count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup (codegen + shuffle files)
      (math.min(once(), once()), op)
    }

    val rows = fanouts.map { f =>
      val (hs, hop) = time(f, hinted = true)
      val (us, uop) = time(f, hinted = false)
      println(f"[fanout] F=$f%-5d hinted($hop)=$hs%7.2f s  " +
        f"unhinted($uop)=$us%7.2f s  ratio=${hs / us}%5.2f")
      (f, hs, hop, us, uop)
    }
    // the knee: largest rung where the hint still wins (or ties within 5%)
    val knee = rows.takeWhile { case (_, hs, _, us, _) => hs <= us * 1.05 }
      .lastOption.map(_._1)
    println(s"[fanout] knee (largest hint-wins rung): ${knee.getOrElse(-1L)}")

    outJson.foreach { path =>
      def num(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val qs = rows.map { case (f, hs, hop, us, uop) =>
        s""""$f":{"hinted_secs":${num(hs)},"hinted_op":"$hop",""" +
          s""""unhinted_secs":${num(us)},"unhinted_op":"$uop"}"""
      }.mkString(",")
      val doc = s"""{"output_mass_rows":$outMass,"cpus":$cpus,""" +
        s""""knee_hint_wins_upto":${knee.getOrElse(-1L)},""" +
        s""""rungs":{$qs}}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc)
      println(s"[fanout] artifact written: $path")
    }
    spark.stop()
  }
}
