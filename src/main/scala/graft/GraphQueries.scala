package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Identity-graph operators (SURVEY §2.4): connected components over an
  * equivalence-edge table (J7 idmap clustering) and the bounded reference
  * BFS (J12). Edges are derived deterministically from the test star
  * schema; the DuckDB oracle re-derives the same answers with recursive
  * CTEs (transitive closure / bounded walk).
  *
  * Node id encoding (disjoint ranges): part = key, supplier = 1e6 + key;
  * for the BFS walk: customer = key, order = 1e7 + key, part = 2e7 + key,
  * supplier = 3e7 + key.
  */
object GraphQueries extends QueryGroup {

  /** J7: CC over the part–supplier co-occurrence graph (sampled orders);
    * per-cluster stats. component = min node id (deterministic canonical
    * election, the analog of the reference's cluster-winner rules). */
  def connectedComponents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = Tables.load(spark, dir, "lineitem")
      .filter($"l_orderkey" % 50 === 0)
      .select($"l_partkey".as("src"), ($"l_suppkey" + 1000000L).as("dst"))
      .distinct()
    operators.Graph.connectedComponents(edges)
      .groupBy($"component")
      .agg(count(lit(1)).as("n_nodes"),
        sum(when($"node" < 1000000L, 1L).otherwise(0L)).as("n_parts"),
        sum(when($"node" >= 1000000L, 1L).otherwise(0L)).as("n_supps"))
  }
  private val ccOracle: String =
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst
      |  FROM lineitem WHERE l_orderkey % 50 = 0),
      |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
      |nodes AS (SELECT DISTINCT src AS node FROM sym),
      |reach(node, r) AS (
      |  SELECT node, node FROM nodes
      |  UNION
      |  SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src),
      |comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
      |SELECT component, COUNT(*) AS n_nodes,
      |  CAST(SUM(CASE WHEN node < 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_parts,
      |  CAST(SUM(CASE WHEN node >= 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_supps
      |FROM comp GROUP BY component""".stripMargin

  /** J12: bounded reference walk (dist <= 3, min-dist) over the typed
    * customer→order→part→supplier graph from 10 seed customers. */
  def bfsWalk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    val edges =
      o.select($"o_custkey".as("src"), ($"o_orderkey" + 10000000L).as("dst"))
        .union(li.select(($"l_orderkey" + 10000000L).as("src"),
          ($"l_partkey" + 20000000L).as("dst")))
        .union(li.select(($"l_partkey" + 20000000L).as("src"),
          ($"l_suppkey" + 30000000L).as("dst")))
        .distinct()
    val seeds = Tables.load(spark, dir, "customer")
      .filter($"c_custkey" < 10).select($"c_custkey".as("node"))
    operators.Graph.bfs(edges, seeds, maxDist = 3)
      .select($"node", $"dist".cast("long").as("dist"))
  }
  private val bfsOracle: String =
    """WITH RECURSIVE e AS (
      |  SELECT o_custkey AS src, 10000000 + o_orderkey AS dst FROM orders
      |  UNION
      |  SELECT 10000000 + l_orderkey, 20000000 + l_partkey FROM lineitem
      |  UNION
      |  SELECT 20000000 + l_partkey, 30000000 + l_suppkey FROM lineitem),
      |seeds AS (SELECT c_custkey AS node FROM customer WHERE c_custkey < 10),
      |walk(node, dist) AS (
      |  SELECT node, 0 FROM seeds
      |  UNION
      |  SELECT e.dst, walk.dist + 1 FROM walk JOIN e ON walk.node = e.src
      |  WHERE walk.dist < 3)
      |SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM walk GROUP BY node""".stripMargin

  override def register(): Unit = {
    Queries.register(QueryDef("g1_connected_components", connectedComponents,
      Some(ccOracle), bench = true))
    Queries.register(QueryDef("g2_bfs_walk", bfsWalk, Some(bfsOracle)))
  }
}
