package graft.sources

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Named corruption counters for the binary-container loaders (zip
  * dumps, SQLite dumps): at 100 TB a corrupt container is a certainty,
  * and the loader contract is quarantine-and-continue — one bad
  * archive must never kill a thousand-archive load with a task death.
  *
  * A Spark `LongAccumulator`, not a JVM `AtomicLong`: the increment
  * happens executor-side inside a flatMap, and only an accumulator
  * flows the count back to the driver on a real cluster. Like every
  * accumulator updated in a transformation, task retries can
  * over-count — the number is monitoring, never data. */
object Quarantine {
  private val counters =
    scala.collection.concurrent.TrieMap.empty[(SparkContext, String), LongAccumulator]

  /** The driver-created counter for `name`, memoized per context so
    * repeated loads share one total. Synchronized: getOrElseUpdate's
    * builder is not atomic and a losing duplicate accumulator would
    * silently swallow its tasks' counts. Entries for stopped contexts
    * are evicted on access — without that, a driver cycling sessions
    * would pin every dead SparkContext (and its accumulators) for the
    * JVM lifetime. */
  def counter(spark: SparkSession, name: String): LongAccumulator =
    counters.synchronized {
      counters.filterInPlace { case ((sc, _), _) => !sc.isStopped }
      counters.getOrElseUpdate((spark.sparkContext, name),
        spark.sparkContext.longAccumulator(s"graft.quarantine.$name"))
    }

  /** Current count (0 if the counter was never created). */
  def value(spark: SparkSession, name: String): Long =
    counters.get((spark.sparkContext, name)).map(_.value.longValue).getOrElse(0L)
}
