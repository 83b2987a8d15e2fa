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

  import org.apache.spark.sql.functions.col

  /** Frontier-driven fixpoint — same closure as `fixpoint` when every
    * expander is NODE-ANCHORED and monotone: it takes a one-column
    * (`v`) node set and returns only edges whose `src` is in that set
    * (the crawl and name-pass reconcilers both have this shape). Then
    * each edge is produced exactly once — the round its anchor node
    * first appears — so per-round work is proportional to the FRONTIER
    * fan-out, not the accumulated reach: the old loop re-joined and
    * re-distincted the full edge set every round (O(rounds × total)),
    * which is the difference between a BFS and re-crawling the whole
    * graph per round at 100 TB. One scalar (new-node count) reaches
    * the driver per round; lineage is cut with localCheckpoint. */
  def frontierFixpoint(seed: DataFrame,
      expanders: Seq[DataFrame => DataFrame],
      maxIter: Int = 50): DataFrame = {
    def nodesOf(e: DataFrame) =
      e.select(col("src").as("v")).union(e.select(col("dst").as("v"))).distinct()
    val seedE = seed.select("src", "dst").distinct().localCheckpoint()
    var seen = nodesOf(seedE).localCheckpoint()
    var frontier = seen
    var layers = List(seedE)
    var iter = 0
    var active = true
    while (active && iter < maxIter) {
      // lazy checkpoints: the count below is the round's ONLY job and
      // materializes both (newEdges via newNodes' lineage)
      val newEdges = expanders.map(_(frontier)).reduce(_ union _)
        .select("src", "dst").distinct().localCheckpoint(eager = false)
      // dst-only, not nodesOf: the node-anchored contract (header) puts
      // every src in `frontier` ⊆ `seen`, so the anti-join would drop
      // them anyway — unioning srcs in just doubled the rows through
      // this distinct's exchange every round (r17, guide §2.3 "shuffle
      // fewer bytes"; ReconcileSpec's whole-set-equality fuzz pins the
      // closure unchanged)
      val newNodes = newEdges.select(col("dst").as("v")).distinct()
        .join(seen, Seq("v"), "left_anti").localCheckpoint(eager = false)
      val n = newNodes.count() // the round's single driver scalar
      layers ::= newEdges
      // plain union, NOT a fresh checkpoint: both sides are already
      // checkpointed, so re-materializing the accumulated set would
      // rewrite O(reach) per round — O(rounds x reach) total, the same
      // disease the frontier restriction cures on the edge side. The
      // union lineage is one node per round over checkpointed leaves.
      seen = seen.union(newNodes) // disjoint by anti-join
      frontier = newNodes
      active = n > 0
      iter += 1
    }
    layers.reduce(_ union _).distinct()
  }
}
