package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{col, min_by, struct, when}
import org.apache.spark.sql.types.LongType

/** Distributed inclusive running sum (prefix sum) under a total order.
  *
  * `SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)` with no
  * PARTITION BY moves the whole input into one partition, exactly like
  * the unpartitioned `row_number()` that GlobalRank replaces. The
  * scalable shape is the same two-pass:
  *
  *   1. range-partition + sort by the ordering;
  *   2. total the value per partition (one long each), prefix-sum those
  *      totals on the driver;
  *   3. stream each partition adding its offset — narrow, no shuffle.
  *
  * Both passes run over the ONE sorted RDD instance so the
  * RangePartitioner's sampled bounds (seeded by RDD id) give identical
  * row→partition placement in the totals job and the output job — the
  * same determinism pin GlobalRank documents.
  *
  * The ordering MUST be a total order (unique tiebreaker) and the value
  * column LongType (the engine's integer-exact arithmetic contract —
  * floating partial sums would make the result partitioning-dependent).
  */
object PrefixSum {

  /** Returns `df` plus `sumCol`, the inclusive running sum of
    * `valueCol` (LongType) under `order` (a total order). NULL values
    * contribute 0 — the same ignore-nulls semantics as a window SUM,
    * except that the running sum itself is 0 (not NULL) before the
    * first non-null value; callers that subtract the (null) value back
    * out see identical results either way. */
  def withRunningSum(df: DataFrame, valueCol: String, sumCol: String,
      order: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    def v(r: Row): Long = if (r.isNullAt(idx)) 0L else r.getLong(idx)
    val rdd = sorted.rdd
    val totals = rdd.mapPartitions(
      it => Iterator.single(it.foldLeft(0L)(_ + v(_))),
      preservesPartitioning = true).collect()
    val offsets = totals.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(sumCol, LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { case (pi, it) =>
      var acc = offsets(pi)
      it.map { r => acc += v(r); Row.fromSeq(r.toSeq :+ acc) }
    }
    spark.createDataFrame(out, schema)
  }

  /** Per-group inclusive running sum WITHOUT a per-group window.
    *
    * Semantically `SUM(v) OVER (PARTITION BY group ORDER BY order ROWS
    * UNBOUNDED PRECEDING)` — but a window partitioned on an unbounded
    * key (a data source, a tenant) sorts each group's entire row set on
    * one reducer, which is a scale-killer when a single group holds a
    * Common-Crawl-sized share of a 100 TB corpus. The scalable shape
    * composes two primitives that each distribute:
    *
    *   1. the GLOBAL running sum under the (group, order...) total
    *      order — range-partitioned two-pass ([[withRunningSum]]), so a
    *      huge group spans many partitions instead of landing on one;
    *   2. each group's start offset — the ordered-FIRST non-null row's
    *      `run - v` per group (`min_by` keyed on the order columns, an
    *      ordinary map-side-combining aggregate) — joined back and
    *      subtracted. min_by, not `min(run - v)`: the min is only the
    *      start offset when running sums are monotone (non-negative
    *      values); the first row's is the start offset under ANY sign.
    *
    * `order` must make (group, order...) a total order and — unlike
    * [[withRunningSum]] — must be PLAIN ascending key columns, not
    * `.asc`/`.desc` SortOrders: the same columns key the min_by struct,
    * and a SortOrder is unevaluable inside a struct. `valueCol`
    * LongType (same contracts as [[withRunningSum]]). */
  def withGroupedRunningSum(df: DataFrame, valueCol: String,
      sumCol: String, groupCol: String, order: Column*): DataFrame = {
    val run = "__psum_run"
    val off = "__psum_off"
    val withRun =
      withRunningSum(df, valueCol, run, (col(groupCol) +: order): _*)
    // null-v rows are skipped (their run - v is unknowable); the first
    // NON-NULL row's run - v equals the group start because nulls
    // contributed 0 to the running sum before it
    val grp = "__psum_grp"
    val offsets = withRun.groupBy(col(groupCol).as(grp))
      .agg(min_by(col(run) - col(valueCol),
        when(col(valueCol).isNotNull, struct(order: _*))).as(off))
    // null-SAFE join: a window PARTITION BY treats NULL keys as one
    // ordinary partition, so this must too — a plain equi-join would
    // silently DROP every null-group row (null = null is not true)
    withRun.join(offsets, col(groupCol) <=> col(grp))
      .withColumn(sumCol, col(run) - col(off))
      .drop(run, off, grp)
  }

  /** Returns `df` plus `maxCol`, the inclusive running MAX of
    * `valueCol` (LongType) under `order` — the same two-pass shape
    * with max as the (associative, commutative) fold: per-partition
    * maxima prefix-combine on the driver, each partition streams with
    * its predecessor offset. Running max is what a streaming watermark
    * is (max event time seen so far), so the lateness audit runs on
    * this instead of an unpartitioned window. */
  def withRunningMax(df: DataFrame, valueCol: String, maxCol: String,
      order: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val totals = rdd.mapPartitions(
      it => Iterator.single(
        it.foldLeft(Long.MinValue)((m, r) => math.max(m, r.getLong(idx)))),
      preservesPartitioning = true).collect()
    val offsets = totals.scanLeft(Long.MinValue)(math.max)
    val schema = sorted.schema.add(maxCol, LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { case (pi, it) =>
      var acc = offsets(pi)
      it.map { r =>
        acc = math.max(acc, r.getLong(idx)); Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
