package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** t_bpe_train: the distributed BPE merge trainer. */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("wrapped-string replace implements BPE's greedy leftmost merge") {
    // the overlap case: aaaa + (a,a) merges to (aa)(aa), aaa to (aa)a
    assert("|a||a||a||a|".replace("|a||a|", "|aa|") === "|aa||aa|")
    assert("|a||a||a|".replace("|a||a|", "|aa|") === "|aa||a|")
    // merged symbol literal comes from collapsing the pair's middle
    assert("|e||r|".replace("||", "") === "|er|")
  }

  test("round-1 merge is the true max-support adjacent pair; merges well-formed") {
    import spark.implicits._
    val out = TextQueries.bpeTrain(spark, TestSpark.sf)
      .orderBy($"round").as[(Long, String, Long)].collect()
    assert(out.length == 5)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.forall(_._3 > 0))
    assert(out.forall(_._2.matches("\\|[^|]+\\|\\|[^|]+\\|")))
    // independent round-1 ground truth: weighted adjacent char pairs
    val words = Tables.load(spark, TestSpark.sf, "documents")
      .select(explode(TextQueries.tokensCol(lower($"text"))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
    val best = words
      .select($"cnt", explode(when(length($"w") >= 2,
        transform(sequence(lit(0), length($"w") - 2), i =>
          concat(lit("|"), $"w".substr(i + 1, lit(1)), lit("||"),
            $"w".substr(i + 2, lit(1)), lit("|"))))
        .otherwise(array().cast("array<string>"))).as("p"))
      .groupBy($"p").agg(sum($"cnt").as("s"))
      .orderBy($"s".desc, $"p".asc).limit(1)
      .as[(String, Long)].head()
    assert(out.head._2 == best._1 && out.head._3 == best._2)
  }
}
