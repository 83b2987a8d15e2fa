package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as driver-controlled DataFrame loops — the
  * Spark re-expression of the reference's identity-graph machinery
  * (`pipeline/process/reference_manager.py:212-407` idmap cluster merge →
  * connected components; `pipeline/process/reference_manager.py:100-210` +
  * `run-reconcile.py:160-220` reference walk → bounded BFS).
  *
  * Scale notes: per-iteration state is a (node, value) table hash-partitioned
  * by node; each round is one shuffle join against the (cached) symmetric
  * edge table. Convergence is detected with a single scalar aggregate
  * (label sums are monotone), not a join. localCheckpoint truncates lineage
  * so plans stay O(1) per round. For very high-diameter graphs the
  * large-star/small-star variant halves rounds; min-propagation suffices
  * for the diameters seen here (~12).
  */
object Graph {

  /** Connected components by min-label propagation over an undirected
    * edge set. Input columns (src, dst); output (node, component) where
    * component = min node id in the component. Deterministic fixpoint. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .distinct().persist()
    // decimal sum: node ids may span the full long range (hashed keys),
    // so a long sum would overflow under ANSI arithmetic
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum($"label".cast("decimal(38,0)"))).head().getDecimal(0)
    var labels = sym.select($"src".as("node")).distinct()
      .withColumn("label", $"node").localCheckpoint()
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val minNbr = sym.join(labels, sym("src") === labels("node"))
        .groupBy($"dst".as("node2")).agg(min($"label").as("nbrMin"))
      // lazy checkpoint: the convergence aggregate below materializes it,
      // so each round costs ONE job (still truncates lineage for reuse)
      val next = labels.join(minNbr, labels("node") === minNbr("node2"), "left")
        .select($"node", least($"label", coalesce($"nbrMin", $"label")).as("label"))
        .localCheckpoint(eager = false)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0 // labels are monotone non-increasing
      prevSum = nextSum
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels.select($"node", $"label".as("component"))
  }

  /** Breadth-first search with min-distance semantics over directed edges
    * (src, dst) from a seed set (node), bounded by maxDist — the
    * reference-walk shape (dist <= 3, min-dist re-queueing). Output
    * (node, dist). */
  def bfs(edges: DataFrame, seeds: DataFrame, maxDist: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select($"src", $"dst").persist()
    var visited = seeds.select($"node").distinct()
      .withColumn("dist", lit(0)).localCheckpoint()
    var frontier = visited.select($"node")
    var d = 0
    while (d < maxDist) {
      d += 1
      val next = e.join(frontier, e("src") === frontier("node"))
        .select($"dst".as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(d)).localCheckpoint()
      visited = visited.union(next).localCheckpoint()
      frontier = next.select($"node")
    }
    e.unpersist()
    visited
  }
}
