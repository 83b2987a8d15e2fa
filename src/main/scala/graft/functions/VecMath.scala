package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the vector hot paths of the
  * similarity/dedup family (SURVEY §2.11).
  *
  * Spark does not compile higher-order functions — `aggregate(zip_with(
  * a, b, _*_))` evaluates an interpreted lambda per element, and the
  * hyperplane-signature fold runs one such aggregate PER PLANE. These
  * expressions keep the arithmetic bit-identical (same modular ±1 sign
  * sequence, same long dot product — the DuckDB oracles are unchanged)
  * but execute as tight JVM loops inside whole-stage codegen:
  * `dot_long` replaces the per-pair verification dot, `hyperplane_sig`
  * computes ALL plane bits in one pass over the vector. */
object VecMath {
  val P = 2147483647L // == TextQueries.HashP (asserted in spec)

  def aj(j: Int): Long = (2L * j + 3) * 104729L % P
  def bj(j: Int): Long = (j + 1L) * 179426549L % P

  /** Exact integer dot product of two long arrays, preserving the
    * `aggregate(zip_with(a, b, _*_))` HOF semantics it replaced: NULL
    * on a length mismatch (zip_with pads the shorter side with nulls)
    * and NULL if any element is null. */
  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** All `planes` hyperplane sign bits in one pass: bit k is set iff
    * sum_i q(i) * sign(k+offset, i) > 0 with the deterministic modular
    * ±1 sign sequence (i is 1-based, as in the Column/SQL forms). */
  def hyperplaneSig(q: ArrayData, planes: Int, offset: Int): Long = {
    val n = q.numElements()
    val sums = new Array[Long](planes)
    var i = 0
    while (i < n) {
      val v = q.getLong(i)
      var k = 0
      while (k < planes) {
        val sign = ((aj(k + offset) * (i + 1) + bj(k + offset)) % P) % 2L * 2L - 1L
        sums(k) += v * sign
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < planes) { if (sums(k) > 0) sig |= (1L << k); k += 1 }
    sig
  }

  /** All `k` minhash permutation minima in one pass over the shingle
    * ids: m_j = min_s (aj(j)*s + bj(j)) % P — identical arithmetic to
    * the per-permutation `array_min(transform(...))` HOF chain it
    * replaces (the DuckDB oracle is unchanged), but one tight loop
    * instead of k interpreted per-element folds per row. */
  def minhashSig(ids: ArrayData, k: Int): ArrayData = {
    val n = ids.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = ids.getLong(i)
      var j = 0
      while (j < k) {
        val v = (aj(j) * s + bj(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** All `bits` simhash vote bits in one pass over the token-hash ids:
    * per plane j, sign(j, x) = ((aj(j)*x + bj(j)) % P) % 2 * 2 - 1
    * summed over elements; bit j set iff the vote sum is positive. */
  def simhashFp(ids: ArrayData, bits: Int): Long = {
    val n = ids.numElements()
    val sums = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val x = ids.getLong(i)
      var j = 0
      while (j < bits) {
        sums(j) += ((aj(j) * x + bj(j)) % P) % 2L * 2L - 1L
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) { if (sums(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  import org.apache.spark.sql.functions.{call_function, lit}

  /** Column wrappers over the native expressions, resolved via the
    * session function registry (same shape as `uri_canon`/`poly_hash`;
    * `Sessions.create` registers them). Static int knobs travel as
    * foldable literals and are re-extracted in the registry builders. */
  def dotCol(a: Column, b: Column): Column = call_function("dot_long", a, b)
  def sigCol(q: Column, planes: Int, offset: Int): Column =
    call_function("hyperplane_sig", q, lit(planes), lit(offset))
  def simhashCol(ids: Column, bits: Int): Column =
    call_function("simhash_fp", ids, lit(bits))
  def minhashCol(ids: Column, k: Int): Column =
    call_function("minhash_sig", ids, lit(k))

  private def litInt(e: Expression): Int = e.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => sys.error(s"expected an integer literal, got $other")
  }

  /** Register the three functions on a session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_long",
      args => DotLong(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("hyperplane_sig",
      args => HyperplaneSig(args(0), litInt(args(1)), litInt(args(2))), "built-in")
    reg.createOrReplaceTempFunction("simhash_fp",
      args => SimhashFp(args(0), litInt(args(1))), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      args => MinhashSig(args(0), litInt(args(1))), "built-in")
  }
}

/** `dot_long(array<long>, array<long>) -> long` as codegen. */
final case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, false) ||
      left.dataType == ArrayType(LongType, true))
      if (right.dataType == ArrayType(LongType, false) ||
        right.dataType == ArrayType(LongType, true))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"dot_long requires ARRAY<BIGINT>, got ${right.dataType}")
    else TypeCheckResult.TypeCheckFailure(
      s"dot_long requires ARRAY<BIGINT>, got ${left.dataType}")

  // nullable even with non-null children: length mismatch / null slot -> NULL
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""java.lang.Long $tmp = graft.functions.VecMath.dotLong($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

/** `hyperplane_sig(array<long>) -> long` as codegen. */
final case class HyperplaneSig(child: Expression, planes: Int, offset: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(LongType, false) ||
      child.dataType == ArrayType(LongType, true))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires ARRAY<BIGINT>, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    VecMath.hyperplaneSig(input.asInstanceOf[ArrayData], planes, offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecMath.hyperplaneSig($c, $planes, $offset);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** `minhash_sig(array<long>, k) -> array<long>` as codegen. */
final case class MinhashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(LongType, false) ||
      child.dataType == ArrayType(LongType, true))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT>, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    VecMath.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecMath.minhashSig($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** `simhash_fp(array<long>) -> long` as codegen. */
final case class SimhashFp(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(LongType, false) ||
      child.dataType == ArrayType(LongType, true))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_fp requires ARRAY<BIGINT>, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    VecMath.simhashFp(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecMath.simhashFp($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimhashFp =
    copy(child = newChild)
}
