package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed dense global row numbering.
  *
  * `row_number()` over an unpartitioned window moves the entire input
  * into ONE partition (Spark even warns: "No Partition Defined for
  * Window operation"). At 100 TB that is a straight OOM. The scalable
  * shape is the classic two-pass:
  *
  *   1. range-partition + sort by the ordering (Spark's own distributed
  *      sort — partition i holds the i-th contiguous key range);
  *   2. count rows per partition (tiny: one long per partition) and
  *      prefix-sum the counts;
  *   3. add the partition's offset to each row's within-partition
  *      position — a narrow map, no further shuffle.
  *
  * Steps 2–3 are exactly `RDD.zipWithIndex`, applied to the ONE sorted
  * RDD instance, which is what makes the result deterministic: the
  * `RangePartitioner`'s sampled bounds live on that RDD object, so the
  * count job and the index map see identical row→partition placement.
  * (A first cut ran the two passes as separate DataFrame actions; each
  * action re-planned the range exchange with a fresh RDD id — and the
  * partitioner's sample seed derives from the RDD id, so the passes
  * disagreed on placement. Pinning one RDD lineage closes that.)
  *
  * The `.rdd` hop costs one row encode/decode at this boundary — the
  * documented trade for a rank that never single-partitions; feed it a
  * narrow projection (key + id), not the full record.
  *
  * The ordering MUST be a total order (include a unique tiebreaker);
  * equal keys never straddle a range boundary, so the rank is then
  * reproducible run to run — same contract as SQL `row_number`.
  */
object GlobalRank {

  /** Returns `df` plus a 1-based dense global rank column `rankCol`
    * under `order` (which must be a total order). */
  def withRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
