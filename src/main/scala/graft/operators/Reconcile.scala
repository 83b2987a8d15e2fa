package graft.operators

import org.apache.spark.sql.DataFrame

/** J6: the reconcile fixpoint — alternate a set of edge-producing
  * reconcilers until the equivalence-edge set stops growing
  * (`pipeline/process/reconciler.py:34-125`: URI pass, name pass,
  * collector crawl repeated until `issubset`).
  *
  * Each reconciler is `currentEdges => newEdges` (same (src, dst)
  * schema). The loop unions + dedupes and stops when the distinct count
  * is stable — the declarative form of the reference's per-record
  * fixpoint. Edges feed Graph.connectedComponents for idmap minting.
  */
object Reconcile {

  def fixpoint(seed: DataFrame,
      reconcilers: Seq[DataFrame => DataFrame],
      maxIter: Int = 10): DataFrame = {
    var edges = seed.select("src", "dst").distinct().localCheckpoint()
    var n = edges.count()
    var iter = 0
    var grown = true
    while (grown && iter < maxIter) {
      var next = edges
      reconcilers.foreach { r =>
        next = next.union(r(next).select("src", "dst")).distinct()
      }
      next = next.localCheckpoint()
      val n2 = next.count()
      grown = n2 != n
      n = n2
      edges = next
      iter += 1
    }
    edges
  }
}
