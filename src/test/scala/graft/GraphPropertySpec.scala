package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Seeded randomized equivalence checks for the iterative graph
  * operators against brute-force references — the contraction +
  * delta-frontier + pointer-doubling machinery has too many moving
  * parts to trust fixtures alone. Fixed seed: failures reproduce. */
class GraphPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Driver-side union-find ground truth with min-label canonicalizer. */
  private def bruteCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    for ((a, b) <- edges) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap { ns =>
      val m = ns.min
      ns.map(_ -> m)
    }.toMap
  }

  test("connectedComponents matches brute-force union-find on random graphs") {
    import spark.implicits._
    val r = new scala.util.Random(0xC0FFEE)
    for (trial <- 0 until 8) {
      val n = r.nextInt(40) + 10 // node universe
      val m = r.nextInt(60) + 1  // edges
      val edges = Seq.fill(m)(
        (r.nextInt(n).toLong, r.nextInt(n).toLong))
      val got = Graph.connectedComponents(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(got === bruteCC(edges), s"trial=$trial edges=$edges")
    }
  }

  test("connectedComponents on adversarial shapes: chain, star, two cliques") {
    import spark.implicits._
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val star = (1L to 30L).map(i => (0L, i))
    val cliques = (for {
      base <- Seq(100L, 200L); i <- 0 until 5; j <- i + 1 until 5
    } yield (base + i, base + j)) :+ (104L, 200L) // bridge merges them
    for (edges <- Seq(chain, star, cliques)) {
      val got = Graph.connectedComponents(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(got === bruteCC(edges))
    }
  }

  test("bfs min-dist matches driver-side Dijkstra-on-unit-weights") {
    import spark.implicits._
    val r = new scala.util.Random(0xBEEF)
    for (trial <- 0 until 4) {
      val n = r.nextInt(30) + 10
      val edges = Seq.fill(r.nextInt(50) + 5)(
        (r.nextInt(n).toLong, r.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val seeds = Seq(0L, 1L)
      val maxDist = 3
      // brute BFS over the directed edge list
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      for (d <- 1 to maxDist) {
        frontier = frontier.flatMap(u => adj.getOrElse(u, Nil))
          .filterNot(dist.contains)
        dist ++= frontier.map(_ -> d)
      }
      val got = Graph.bfs(edges.toDF("src", "dst"),
          seeds.toDF("node"), maxDist)
        .as[(Long, Int)].collect().toMap
      assert(got === dist, s"trial=$trial edges=$edges")
    }
  }

  test("boundedSssp matches brute hop-bounded Bellman-Ford on random weighted graphs") {
    import spark.implicits._
    val r = new scala.util.Random(0x5E55)
    for (trial <- 0 until 6) {
      val n = r.nextInt(25) + 8
      val edges = Seq.fill(r.nextInt(60) + 5)(
        (r.nextInt(n).toLong, r.nextInt(n).toLong, r.nextInt(20).toLong + 1L))
        .filter(e => e._1 != e._2)
      val seeds = Seq(0L, 1L)
      val maxHops = r.nextInt(4) + 1
      // brute DP: d_h(v) = min(d_{h-1}(v), min over (u,v,w) of d_{h-1}(u)+w)
      var dist: Map[Long, Long] = seeds.map(_ -> 0L).toMap
      for (_ <- 1 to maxHops) {
        val relax = edges.flatMap { case (u, v, w) =>
          dist.get(u).map(du => v -> (du + w))
        }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
        dist = (dist.keySet ++ relax.keySet).map { v =>
          v -> math.min(dist.getOrElse(v, Long.MaxValue),
            relax.getOrElse(v, Long.MaxValue))
        }.toMap
      }
      val got = Graph.boundedSssp(edges.toDF("src", "dst", "w"),
          seeds.toDF("node"), maxHops)
        .as[(Long, Long)].collect().toMap
      assert(got === dist, s"trial=$trial maxHops=$maxHops edges=$edges")
    }
  }

  test("boundedSssp prefers a cheaper longer path and exits early at the fixpoint") {
    import spark.implicits._
    // 0 -> 3 direct cost 100; 0 ->1 ->2 ->3 total cost 3
    val edges = Seq((0L, 3L, 100L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
    val seeds = Seq(0L)
    // within 1 hop the direct edge wins; within 3 the cheap chain wins
    val oneHop = Graph.boundedSssp(edges.toDF("src", "dst", "w"),
      seeds.toDF("node"), maxHops = 1).as[(Long, Long)].collect().toMap
    assert(oneHop === Map(0L -> 0L, 1L -> 1L, 3L -> 100L))
    val threeHop = Graph.boundedSssp(edges.toDF("src", "dst", "w"),
      seeds.toDF("node"), maxHops = 3).as[(Long, Long)].collect().toMap
    assert(threeHop === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // a generous bound converges early to the same fixpoint
    val big = Graph.boundedSssp(edges.toDF("src", "dst", "w"),
      seeds.toDF("node"), maxHops = 50).as[(Long, Long)].collect().toMap
    assert(big === threeHop)
  }
}
