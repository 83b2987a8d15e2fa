package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Order-sensitive record-merge fold (SURVEY A1/A2) — the Spark
  * re-expression of the reference's RecordMerger
  * (`pipeline/process/merger.py:670-924`): N records per cluster fold into
  * one, where "first by merge_order wins" for scalar fields, id-sets
  * union, and numerics accumulate.
  *
  * The reference folds sequentially in merge_order. A distributed fold
  * must be associative + commutative, so the buffer carries the winning
  * record's merge-order key and every combine keeps the smaller key's
  * scalars — the result equals the sequential fold regardless of
  * partitioning or arrival order (the determinism requirement SURVEY
  * §7.4.1 calls out). No sort, no collect_list: one partial-agg shuffle.
  */
object RecordMerge {

  /** One mergeable record: cluster key + merge-order key + payload. */
  final case class Rec(cluster: Long, orderKey: Long, epochMs: Long,
      status: String, priority: String, cents: Long)

  /** Fold buffer: winner-so-far scalars + accumulators. */
  final case class Buf(epochMs: Long, orderKey: Long, status: String,
      priority: String, statuses: Seq[String], n: Long, cents: Long)

  final case class Merged(firstOrderkey: Long, baseStatus: String,
      basePriority: String, statuses: String, nMerged: Long, totalCents: Long)

  /** (epochMs, orderKey) lexicographic "merge_order" comparison. */
  private def firstWins(aMs: Long, aKey: Long, bMs: Long, bKey: Long): Boolean =
    aMs < bMs || (aMs == bMs && aKey < bKey)

  val merger: Aggregator[Rec, Buf, Merged] = new Aggregator[Rec, Buf, Merged] {
    def zero: Buf = Buf(Long.MaxValue, Long.MaxValue, null, null, Nil, 0L, 0L)
    def reduce(b: Buf, r: Rec): Buf = {
      val takeNew = firstWins(r.epochMs, r.orderKey, b.epochMs, b.orderKey)
      Buf(
        if (takeNew) r.epochMs else b.epochMs,
        if (takeNew) r.orderKey else b.orderKey,
        if (takeNew) r.status else b.status,
        if (takeNew) r.priority else b.priority,
        (b.statuses :+ r.status).distinct,
        b.n + 1, b.cents + r.cents)
    }
    def merge(a: Buf, b: Buf): Buf = {
      val aFirst = firstWins(a.epochMs, a.orderKey, b.epochMs, b.orderKey)
      Buf(
        if (aFirst) a.epochMs else b.epochMs,
        if (aFirst) a.orderKey else b.orderKey,
        if (aFirst) a.status else b.status,
        if (aFirst) a.priority else b.priority,
        (a.statuses ++ b.statuses).distinct,
        a.n + b.n, a.cents + b.cents)
    }
    def finish(b: Buf): Merged =
      Merged(b.orderKey, b.status, b.priority,
        b.statuses.sorted.mkString(","), b.n, b.cents)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Merged] = Encoders.product[Merged]
  }
}
