package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Graph, Substrate}

/** r18: the byte-scaled substrate layout (Substrate.scaledPartitions).
  * The fixpoint substrates are built `repartition(n, $"src")` and their
  * cached layout is FROZEN by canChangeCachedPlanOutputPartitioning=
  * false, so `n` must scale with the data, never sit at the
  * cores-coupled shuffle.partitions constant — and a hub src (a
  * star-contracted giant component's root) must stay a BOUNDED linear
  * block, not an unbounded straggler. */
class GraphSubstrateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withTarget[A](bytes: Long)(body: => A): A = {
    spark.conf.set(Substrate.TargetBytesKey, bytes.toString)
    try body finally spark.conf.unset(Substrate.TargetBytesKey)
  }

  test("scaledPartitions floors at shuffle.partitions for small inputs") {
    import spark.implicits._
    val floor = spark.sessionState.conf.numShufflePartitions
    val tiny = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    // default 64 MiB target: a bench-scale input always hits the floor,
    // so local behavior (and the driver's bench) is unchanged by r18
    assert(Substrate.scaledPartitions(tiny) === floor)
  }

  test("scaledPartitions grows with the byte estimate, never below the floor") {
    import spark.implicits._
    val floor = spark.sessionState.conf.numShufflePartitions
    val big = spark.range(0L, 200000L).select($"id".as("src"), ($"id" + 1).as("dst"))
    // leaf (scan) bytes — the size source scaledPartitions documents
    val est = big.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes)
      .filter(b => b > 0 && b < BigInt(Long.MaxValue) / 4).sum
    assert(est > 0) // sane leaf estimate
    withTarget(1024L) {
      val n = Substrate.scaledPartitions(big)
      assert(n > floor, s"expected byte-scaled count > floor=$floor, got $n")
      // ceil(bytes/target), as documented
      assert(BigInt(n) === (est + 1023) / 1024)
    }
    // a target far above the estimate floors
    withTarget(Long.MaxValue / 8)(
      assert(Substrate.scaledPartitions(big) === floor))
  }

  test("hub-skewed star graph: CC exact under the byte-scaled frozen layout") {
    import spark.implicits._
    // one hub (node 1) with 3000 leaves plus a 500-node chain — the
    // post-localContraction shape of a giant component (a star root's
    // src degree equals its component size, the r17 advice hazard)
    val hub = spark.range(2L, 3002L).select(lit(1L).as("src"), $"id".as("dst"))
    val chain = spark.range(5000L, 5500L)
      .select($"id".as("src"), ($"id" + 1).as("dst"))
    val edges = hub.union(chain)
    val got = withTarget(4096L) {
      Graph.connectedComponents(edges).as[(Long, Long)].collect()
    }
    val byNode = got.toMap
    assert(byNode(1L) === 1L && byNode(3001L) === 1L) // hub component
    assert((5000L to 5500L).forall(byNode(_) === 5000L)) // chain component
    assert(got.length === 3502)
  }

  test("hub rung: the hub's edge block is one bounded linear block; the bulk spreads") {
    import spark.implicits._
    // rebuild the substrate exactly as Graph.connectedComponents does
    // (sym = star ∪ reverse, repartition(scaled, src)) on a hub graph
    // and measure the frozen layout's partition profile: the hub's
    // reverse edges necessarily co-locate (hash(src) is the layout
    // contract every per-round join reuses), so the DOCUMENTED bound is
    // max-partition ≤ hub degree + a fair share of the bulk — a single
    // linear scan per round, engaged only in rounds where a hub
    // neighbor's label changed (delta propagation) — while the non-hub
    // bulk spreads evenly over the byte-scaled count.
    val hubDeg = 4000L
    val hub = spark.range(10L, 10L + hubDeg)
      .select(lit(1L).as("src"), $"id".as("dst"))
    val bulk = spark.range(100000L, 130000L)
      .select($"id".as("src"), ($"id" + 1).as("dst"))
    val raw = hub.union(bulk)
    val sym = raw.union(raw.select($"dst".as("src"), $"src".as("dst")))
    withTarget(8192L) {
      val n = Substrate.scaledPartitions(sym)
      assert(n > spark.sessionState.conf.numShufflePartitions)
      val sizes = sym.repartition(n, $"src")
        .rdd.mapPartitions(it => Iterator(it.size.toLong)).collect()
      val total = sizes.sum
      assert(total === 2 * (hubDeg + 30000L))
      val fairShare = (total - hubDeg).toDouble / n
      val bound = hubDeg + math.max(32.0, 8.0 * fairShare)
      assert(sizes.max <= bound,
        s"hub partition ${sizes.max} exceeds documented bound $bound (n=$n)")
      // the non-hub bulk is NOT in the hub's partition-sized class:
      // at least half the partitions carry under 4x the fair share
      val smallish = sizes.count(_ <= 4.0 * fairShare + 32)
      assert(smallish * 2 >= sizes.length,
        s"bulk failed to spread: $smallish/${sizes.length} small partitions")
    }
  }
}
