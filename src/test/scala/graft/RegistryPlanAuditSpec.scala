package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}

/** Registry-wide scale audit: EVERY registered query's physical plan is
  * traversed (not string-matched) and checked for the three shapes that
  * do not survive a 100× scale-up:
  *
  *   - CartesianProductExec — an all-pairs join;
  *   - WindowExec with an empty partitionSpec — a single-partition
  *     global window (the repo owns operators.PrefixSum/GlobalRank for
  *     that shape);
  *   - BroadcastNestedLoopJoinExec whose broadcast side is NOT a
  *     scalar aggregate — broadcasting one computed row (a count, a
  *     corpus total) is the sanctioned crossJoin(broadcast(scalar))
  *     idiom; broadcasting anything wider is an unbounded product.
  *
  * Per-query PlanSpec/DedupPlanSpec pins assert positive structure
  * (which join strategy, where the exchanges are); this sweep asserts
  * the negative claim globally so "no cartesian and no unpartitioned
  * window anywhere in the registry" is a test, not a review note.
  * AQE is disabled while planning so the raw join/window operators are
  * visible (AQE can only improve on them at runtime, never introduce
  * these shapes).
  *
  * Allowlist: a handful of queries broadcast a BOUNDED non-scalar side
  * by design — brute/ADC vector scans broadcast the fixed query set or
  * codebook, the decontamination audit broadcasts the benchmark
  * fraction, the file-skipping eval probes 4 predicates against
  * per-file stats, and the source-overlap matrix pairs a bounded
  * source domain. Each is pinned BY NAME with the bounded side stated;
  * the sweep fails if any OTHER query grows one of these shapes, and
  * also if an allowlist entry goes stale (entry no longer exhibits the
  * shape — keep the list tight). */
class RegistryPlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** query name → bounded side justifying its non-equi join shape.
    * (The centroid-table broadcasts of v4/v5/v6/v11/v14 need no entry:
    * their build sides are scalar collect_list aggregates, which the
    * general rule recognizes — including through cached plans and
    * reused exchanges.) */
  private val boundedBroadcast: Map[String, String] = Map(
    "v1_knn_brute" -> "fixed 100-query probe set (the documented brute baseline)",
    "v8_pq_search" -> "per-query PQ lookup tables (M×K entries)",
    "v10_pq_rerank" -> "coarse-pass candidate LUTs, top-N bounded",
    "v16_nprobe_sweep" -> "widest-budget candidate set, filtered per level",
    "v15_mrl_truncate_eval" -> "10-probe broadcast set (persisted pairs — visible once the sweep recurses into cached plans)",
    "v12_hard_negatives" -> "fixed NQueries probe set (v1's shape, under the persisted scored table)",
    "v13_bitext_margin" -> "the non-pivot (xx) side broadcast for the map-only margin cross; per-id state is TopK-bounded",
    "d17_embed_decontaminate" -> "benchmark vectors (corpus/37, the broadcast probe)",
    "v17_bitext_recall" -> "en_id % 37 = 1 sampled probe set broadcast for the truth scan (d19b's sampling move)",
    "s19_file_skipping_eval" -> "4 range predicates × 16 per-file stat rows")

  /** Rule 17b as a test, not prose: a window may only PARTITION BY keys
    * whose per-key row count is structurally bounded — a document's
    * positions, one probe's candidate list, an enumerated value domain.
    * Key names are matched at the plan level (the window's partition
    * attributes); a WindowExec carrying any key outside this list fails
    * the sweep. The packing prefix sums (t_pack_chunks and the corpus
    * pipeline's packing stage) were the conversion this rule forced:
    * `source` is NOT here because one Common-Crawl-sized source would
    * sort on a single reducer. Staleness is enforced like the join
    * allowlists: every named key must still appear under some window. */
  private val boundedWindowKeys: Map[String, String] = Map(
    "doc_id" -> "per-document positions/spans, bounded by doc length",
    "user_id" -> "per-user session events (the sessionization idiom)",
    "window_start" -> "per time-window aggregation slice",
    "event_type" -> "enumerated event-type domain",
    "lang" -> "enumerated language domain",
    "query_id" -> "fixed probe set (NQueries), candidates pre-bounded",
    "nprobe" -> "parameter-sweep domain (a handful of budget levels)")

  /** The one sanctioned CartesianProduct: a pair matrix over a BOUNDED
    * aggregate domain, where both product sides are already grouped to
    * |sources| rows. Kept separate from the broadcast allowlist so a
    * broadcast query regressing to a true cartesian can never pass. */
  private val boundedProduct: Map[String, String] = Map(
    "t_source_overlap" -> "source-domain pair matrix (|sources|^2 rows)")

  /** The plan plus every plan reachable through a cached relation or a
    * reused exchange — a violation hidden under a .persist()'d subtree
    * is just as fatal at 100×, but collectWithSubqueries alone never
    * descends into InMemoryTableScanExec.relation.cachedPlan (round-9's
    * sweep missed v15's persisted BNLJ exactly this way). Identity-set
    * visited guard: reused exchanges can re-reach the same subtree. */
  private def expand(p: SparkPlan,
      seen: java.util.IdentityHashMap[SparkPlan, Unit] =
        new java.util.IdentityHashMap[SparkPlan, Unit]): Seq[SparkPlan] =
    if (seen.containsKey(p)) Nil
    else {
      seen.put(p, ())
      val nested = p.collectWithSubqueries {
        case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          c.relation.cachedPlan
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          r.child
      }
      p +: nested.flatMap(expand(_, seen))
    }

  private def scalarAggBelow(p: SparkPlan): Boolean = p.collectFirst {
    case a: HashAggregateExec if a.groupingExpressions.isEmpty => true
    case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty => true
    case a: SortAggregateExec if a.groupingExpressions.isEmpty => true
    // a cached build side hides its plan behind the scan — recurse into it
    case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
        if scalarAggBelow(c.relation.cachedPlan) => true
    // a deduplicated exchange points at the original — follow it
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec
        if scalarAggBelow(r.child) => true
  }.nonEmpty

  test("every registered query plans free of cartesians and unpartitioned windows") {
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    val sanctioned = scala.collection.mutable.Set[String]()
    val windowKeysSeen = scala.collection.mutable.Set[String]()
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Queries.all) {
        try {
          val plan = q.fn(spark, TestSpark.sf).queryExecution.executedPlan
          val hits = expand(plan).flatMap(_.collectWithSubqueries {
            case _: CartesianProductExec => Some("CartesianProduct")
            case w: WindowExec if w.partitionSpec.isEmpty =>
              Some("unpartitioned Window")
            case w: WindowExec =>
              val keys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
              windowKeysSeen ++= keys.filter(boundedWindowKeys.contains)
              val unbounded = keys.filterNot(boundedWindowKeys.contains)
              if (unbounded.nonEmpty)
                Some(s"Window over unbounded partition key(s) " +
                  s"${unbounded.toSeq.sorted.mkString(",")} " +
                  "(add to boundedWindowKeys ONLY with a structural bound)")
              else None
            case j: BroadcastNestedLoopJoinExec
                // only the BUILD (broadcast) side may justify the join:
                // a scalar aggregate on the streamed side proves nothing
                if !scalarAggBelow(j.buildSide match {
                  case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
                  case _ => j.right
                }) =>
              val side = j.buildSide match {
                case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
                case _ => j.right
              }
              val head = side.collect { case n => n.nodeName }.take(10).mkString(" <- ")
              Some(s"non-scalar BroadcastNestedLoopJoin (build: $head)")
            case _ => None
          }).flatten.distinct
          hits.foreach { h =>
            // a global window is never sanctioned; each join shape has
            // its OWN named allowlist — a broadcast design regressing
            // to a true cartesian must fail
            val ok = (h.startsWith("non-scalar BroadcastNestedLoopJoin") &&
              boundedBroadcast.contains(q.name)) ||
              (h == "CartesianProduct" && boundedProduct.contains(q.name))
            if (ok) sanctioned += q.name
            else violations += s"${q.name}: $h"
          }
        } catch { case e: Throwable =>
          violations += s"${q.name}: failed to plan: " +
            String.valueOf(e.getMessage).linesIterator.next().take(120)
        }
        // iterative queries persist their substrates during construction;
        // drop them so the sweep's storage footprint stays per-query
        spark.catalog.clearCache()
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
    assert(violations.isEmpty,
      s"${violations.size} plan violations:\n" + violations.mkString("\n"))
    // staleness: every allowlist entry must still earn its place
    val stale = (boundedBroadcast.keySet ++ boundedProduct.keySet) -- sanctioned
    assert(stale.isEmpty,
      s"allowlist entries no longer exhibit the shape (remove them): $stale")
    val staleKeys = boundedWindowKeys.keySet -- windowKeysSeen
    assert(staleKeys.isEmpty,
      s"bounded window keys no longer under any window (remove them): $staleKeys")
  }
}
