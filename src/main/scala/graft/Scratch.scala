package graft

import org.apache.spark.sql.functions._

/** Ad-hoc experiments main (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.create("scratch", "8")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val P = TextQueries.HashP
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val th = Tables.load(spark, dir, "documents")
      .select($"doc_id", transform(TextQueries.tokensCol($"text"),
        TextQueries.wordHash(_)).as("h"))
    time("p1 token hashes")(th.agg(sum(size($"h"))).collect())
    val sid = th.select($"doc_id", when(size($"h") >= 3,
      array_distinct(transform(sequence(lit(1), size($"h") - 2), i =>
        ((element_at($"h", i) * 131L + element_at($"h", i + 1)) % P * 131L +
          element_at($"h", i + 2)) % P)))
      .otherwise(array().cast("array<long>")).as("sid"))
      .filter(size($"sid") > 0)
    time("p2 shingle ids")(sid.agg(sum(size($"sid"))).collect())
    val sigs = sid.select($"doc_id" +: (0 until 16).map(j =>
      array_min(transform($"sid", s =>
        (lit(DedupQueries.aj(j)) * s + lit(DedupQueries.bj(j))) % P)).as(s"m$j")): _*)
    time("p3 sigs")(sigs.agg(sum($"m0")).collect())
    val bandCols = (0 until 8).map(b =>
      struct(lit(b).as("band_idx"),
        (($"m${2 * b}" * 131L + $"m${2 * b + 1}") % P).as("band_hash")))
    val bandRows = sigs
      .select($"doc_id", explode(array(bandCols: _*)).as("band"))
      .select($"doc_id", $"band.band_idx", $"band.band_hash")
    time("p4 bandRows")(bandRows.count())
    val cand = bandRows.as("a").join(bandRows.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    time("p5 cand")(cand.count())
    time("p6 registered d2")(DedupQueries.minhashLsh(spark, dir).count())
    spark.stop()
  }
}
