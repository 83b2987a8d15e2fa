package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VecMath

/** The codegen vector expressions must be bit-identical to the
  * higher-order-function forms they replaced (the DuckDB oracles still
  * replay the HOF arithmetic). */
class VecMathSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("constants match the shared hash modulus") {
    assert(VecMath.P === TextQueries.HashP)
    assert(VecMath.aj(5) === DedupQueries.aj(5))
    assert(VecMath.bj(17) === DedupQueries.bj(17))
  }

  test("dot_long equals the zip_with/aggregate fold") {
    import spark.implicits._
    val df = Seq((Seq(1L, -2L, 3L), Seq(4L, 5L, -6L)), (Seq(0L), Seq(7L)))
      .toDF("a", "b")
    val got = df.select(VecMath.dotCol($"a", $"b")).as[Long].collect().toSeq
    val want = df.select(
      aggregate(zip_with($"a", $"b", _ * _), lit(0L), _ + _))
      .as[Long].collect().toSeq
    assert(got === want && got === Seq(4L - 10L - 18L, 0L))
  }

  test("dot_long preserves HOF null semantics: mismatch/null slot -> NULL") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)),   // clean
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](3L, 4L)), // length mismatch
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L))  // null element
    ).toDF("a", "b")
    val got = df.select(VecMath.dotCol($"a", $"b")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    val want = df.select(
      aggregate(zip_with($"a", $"b", _ * _), lit(0L), _ + _)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    assert(got === want && got === Seq(11L, null, null))
  }

  test("hyperplane_sig equals the per-plane HOF bits") {
    import spark.implicits._
    val P = VecMath.P
    val df = Seq(Tuple1(Seq(120L, -340L, 560L, -7L)),
      Tuple1(Seq(-1L, -2L, -3L))).toDF("q")
    for ((planes, offset) <- Seq((8, 16), (16, 32))) {
      val hof = (0 until planes).map { k =>
        val s = aggregate(
          transform(sequence(lit(1), size($"q")), i =>
            element_at($"q", i) *
              (((lit(VecMath.aj(k + offset)) * i + lit(VecMath.bj(k + offset))) % P) % 2L * 2L - 1L)),
          lit(0L), _ + _)
        when(s > 0, lit(1L << k)).otherwise(lit(0L))
      }.reduce(_ + _)
      assert(df.select(VecMath.sigCol($"q", planes, offset)).as[Long].collect().toSeq
        === df.select(hof).as[Long].collect().toSeq)
    }
  }

  test("minhash_sig equals the per-permutation array_min folds") {
    import spark.implicits._
    val P = VecMath.P
    val k = 16
    val df = Seq(Tuple1(Seq(12345L, 67890L, 13L)), Tuple1(Seq(99L)))
      .toDF("sid")
    val hof = array((0 until k).map(j =>
      array_min(transform($"sid",
        s => (lit(VecMath.aj(j)) * s + lit(VecMath.bj(j))) % P))): _*)
    assert(df.select(VecMath.minhashCol($"sid", k)).as[Seq[Long]].collect().toSeq
      === df.select(hof).as[Seq[Long]].collect().toSeq)
  }

  test("simhash_fp equals the per-plane vote fold") {
    import spark.implicits._
    val P = VecMath.P
    val df = Seq(Tuple1(Seq(12345L, 67890L, 13L)), Tuple1(Seq(99L)))
      .toDF("ids")
    val bits = 64
    val votes = (0 until bits).map(j =>
      aggregate($"ids", lit(0L), (acc, x) =>
        acc + ((lit(VecMath.aj(j)) * x + lit(VecMath.bj(j))) % P) % 2L * 2L - 1L).as(s"v$j"))
    val hofFp = (0 until bits).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val want = df.select(votes: _*).select(hofFp).as[Long].collect().toSeq
    val got = df.select(VecMath.simhashCol($"ids", bits)).as[Long].collect().toSeq
    assert(got === want)
  }
}
