package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** The engine-owned cache regime for ENGINE-INTERNAL CORPUS-SHAPED
  * CACHES — originally (round 15) the iterative-operator substrates a
  * fixpoint loop probes every round (edge tables, name indexes, day-0
  * bases); broadened in round 16 to every `.persist()` in the query
  * layer (LSH shingle/signature/band tables, the lux entity+triple
  * substrate, token tables, monotone stream indexes — all tables whose
  * size scales with the corpus). Plain `.persist()` remains only for
  * provably batch-bounded deltas (StreamingOps' per-batch tables) and
  * O(1)-size grids (JoinPlanner sketches), where a pressure profile
  * gains nothing by spilling them.
  *
  * Why this exists (round-14 spill-regime finding): on a squeezed
  * executor pool, a stage that MATERIALIZES a MEMORY_AND_DISK substrate
  * in the same stage as its aggregations holds in-progress UNROLL
  * reservations — storage-side memory that is not evictable at any
  * storageFraction while the unroll runs — and the same tasks'
  * hash-aggregate first page finds a zero-free pool
  * (`HashAggregateExec.createHashMap` OOM on la_build / j6 at 8 GiB ×
  * fraction 0.15). DISK_ONLY skips the MemoryStore entirely (no unroll
  * reservation), so execution keeps the whole pool. Round 14 proved the
  * fix with the cluster-wide `spark.sql.defaultCacheStorageLevel` knob;
  * that leaves the lesson as deployment folklore — a deployment that
  * misses the doc re-discovers the OOM. This config makes the regime
  * the ENGINE's: every fixpoint substrate persist routes through here,
  * and a pressure profile sets ONE graft-owned key instead of rewriting
  * every `persist()` in the application.
  *
  * Default stays MEMORY_AND_DISK — the right level when the pool is
  * healthy (the common case; a round-probed substrate in memory is the
  * point of persisting it). Pressure deployments set DISK_ONLY.
  *
  * Reference frame: the reference survives memory pressure because
  * Postgres spills for it (`storage/cache/postgres.py:117-140`); this
  * engine survives because its operators declare their cache regime.
  */
object Substrate {

  val ConfKey = "spark.graft.substrateStorageLevel"

  /** Advisory bytes per partition for byte-scaled substrate builds
    * (below). 64 MiB: small enough that one straggler partition is a
    * bounded linear scan, large enough that bench-scale inputs stay at
    * the parallelism floor. */
  val TargetBytesKey = "spark.graft.substrateTargetPartitionBytes"

  /** Partition count for an explicitly keyed substrate build:
    * max(shuffle.partitions, estimated bytes / target), capped.
    *
    * Why (r18, verdict item 2): the fixpoint substrates are built
    * `repartition($"key")` and their cached layout is FROZEN by
    * `canChangeCachedPlanOutputPartitioning=false` (Sessions) so every
    * per-round consumer reuses it exchange-free. A bare repartition
    * inherits `spark.sql.shuffle.partitions` — a cores-coupled
    * CONSTANT — and the freeze removes AQE's ability to re-split the
    * cached bulk, so at 100 TB a corpus-sized substrate would be pinned
    * to O(cores) partitions. Deriving the count from the plan's size
    * estimate (the same pre-runtime stats AQE itself plans with) makes
    * the frozen layout byte-proportional at any scale while the
    * shuffle-partitions floor keeps bench-scale behavior identical
    * (estimates below one target byte-chunk hit the floor).
    *
    * The bytes are the sum over the plan's TRUSTWORTHY leaves — the
    * scan sizes, never full-plan estimates: file-source leaves carry
    * real file bytes, Range/LocalRelation real row counts, and a cache
    * leaf its REAL cached bytes when (and only when) it is already
    * materialized. Everything else contributes zero. Measured reasons,
    * in the order this round hit them: (1) full-plan estimates above an
    * LSH SELF-join are row-quadratic — r2's CC substrate fanned to
    * 10,198 partitions (48 s vs 2.3 s); (2) an UNmaterialized cache
    * leaf falls back to its child's full-plan estimate, which above
    * joins over token arrays is the same garbage — t_corpus's CC
    * substrate fanned to 19,074 partitions (184 s vs 3.7 s). A
    * substrate is a bounded derivation of its scans (union/dedup/
    * project), so scan bytes are the right scale proxy; where no
    * trustworthy leaf is visible the count falls back to the floor —
    * the pre-r18 behavior — rather than trusting an estimate that can
    * be off by six orders of magnitude. */
  private[graft] def scaledPartitions(df: Dataset[_]): Int = {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Range => LRange}
    val spark = df.sparkSession
    val floor = spark.sessionState.conf.numShufflePartitions
    val target = spark.conf.getOption(TargetBytesKey)
      .map(_.toLong).filter(_ > 0).getOrElse(64L << 20)
    val junk = BigInt(Long.MaxValue) / 4
    val bytes = df.queryExecution.optimizedPlan.collectLeaves().map {
      case imr: InMemoryRelation =>
        if (imr.cacheBuilder.isCachedColumnBuffersLoaded) imr.stats.sizeInBytes
        else BigInt(0) // unmaterialized: falls back to child estimate — junk
      case lr: LogicalRelation => lr.stats.sizeInBytes // real file bytes
      case r: LRange => r.stats.sizeInBytes
      case r: LocalRelation => r.stats.sizeInBytes
      case _ => BigInt(0) // LogicalRDD etc.: no trustworthy size
    }.filter(b => b > 0 && b < junk).sum
    if (bytes <= 0) floor
    else ((bytes + target - 1) / target).max(floor).min(1 << 20).toInt
  }

  /** Resolution order (advice r15): the graft key REFINES the cluster
    * knob rather than overriding it. When `spark.graft.
    * substrateStorageLevel` is unset, fall back to the session's
    * `spark.sql.defaultCacheStorageLevel` — the knob the round-14
    * pressure recipe documented — so a deployment that sets ONLY the
    * cluster-wide level to DISK_ONLY still gets DISK_ONLY at the
    * substrate sites (which previously honored it via bare persist()),
    * instead of a silent MEMORY_AND_DISK that can re-hit the
    * unroll-reservation OOM this regime exists to prevent. */
  def level(spark: SparkSession): StorageLevel =
    StorageLevel.fromString(spark.conf.getOption(ConfKey).getOrElse(
      spark.conf.get("spark.sql.defaultCacheStorageLevel", "MEMORY_AND_DISK")))

  /** `.persistSubstrate()` — drop-in for `.persist()` at substrate
    * sites; reads the session's configured regime at call time. */
  implicit final class SubstrateOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def persistSubstrate(): Dataset[T] =
      ds.persist(level(ds.sparkSession))
  }
}
