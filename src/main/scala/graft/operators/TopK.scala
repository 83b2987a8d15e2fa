package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed Aggregator.
  *
  * The buffer holds at most k entries ordered by (value desc, id asc),
  * so the partial/merge tree ships ≤ k rows per group per partition
  * instead of the group's whole population. This is the map-side-combine
  * form of the `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`
  * pattern: the window form shuffles and sorts EVERY row of every group
  * before discarding all but k, while this aggregator discards before
  * the exchange — at 100 TB the shuffle is k·|groups|, not |rows|.
  * (collect_list+slice has the same plan shape but an unbounded partial
  * buffer; this one is O(k) per group at every node of the merge tree.)
  *
  * The id is a required unique tie-break (QueryDef determinism contract:
  * every top-k carries a total order), so partial merge order can never
  * change the result.
  *
  * Reference analog: the ranked-candidate election takes
  * (`pipeline/process/base/reconciler.py` name-vote winners,
  * `sources/lux/final/mapper.py` primary-name election) — each is a
  * per-key bounded selection, never a global sort.
  */
object TopK {
  final case class Entry(v: Long, id: Long)
  final case class Buf(items: Seq[Entry])

  private def ordered(items: Seq[Entry], k: Int): Seq[Entry] =
    items.sortBy(e => (-e.v, e.id)).take(k)

  final case class TopKAgg(k: Int) extends Aggregator[Entry, Buf, Buf] {
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: Entry): Buf =
      // a value below the full buffer's floor can't enter: skip the sort
      if (b.items.length >= k &&
          { val f = b.items.last; a.v < f.v || (a.v == f.v && a.id > f.id) }) b
      else Buf(ordered(a +: b.items, k))
    override def merge(x: Buf, y: Buf): Buf = Buf(ordered(x.items ++ y.items, k))
    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
