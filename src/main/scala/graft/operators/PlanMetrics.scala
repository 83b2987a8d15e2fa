package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Post-execution plan observability: fold a query's executed plan into
  * the handful of numbers an operator actually watches at 100 TB —
  * how much data crossed the wire, how many shuffles, whether anything
  * spilled. Reads the same SQLMetrics the Spark UI renders, so it
  * needs an EXECUTED DataFrame (run an action first); with AQE on, the
  * adaptive root is unwrapped to the final re-planned tree, not the
  * initial guess.
  *
  * This is the programmatic hook for regression gates: assert a
  * pipeline's shuffle volume or spill stays inside budget in CI
  * instead of eyeballing the UI after a bad night. */
object PlanMetrics {

  final case class Summary(
      shuffles: Int,
      shuffleRecords: Long,
      shuffleBytes: Long,
      spillBytes: Long,
      peakNodeOutputRows: Long)

  /** Walk the EXECUTED tree: AQE roots resolve to their final plan and
    * query-stage wrappers (leaf nodes post-execution) open into the
    * stage's actual subtree, where the incremented metrics live.
    * Reused exchanges are skipped so shared shuffles count once. */
  private def expand(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
    case q: QueryStageExec => expand(q.plan)
    case _: ReusedExchangeExec => Seq.empty
    case other => other +: other.children.flatMap(expand)
  }

  private def metric(p: SparkPlan, name: String): Long =
    p.metrics.get(name).map(_.value).getOrElse(0L)

  /** Summarize an ALREADY-EXECUTED DataFrame's physical plan. NOTE:
    * the DataFrame itself must have been executed (`collect()`,
    * `write`, `foreach`) — `df.count()` runs a DIFFERENT derived plan
    * and leaves this one's metrics untouched. */
  def summarize(df: DataFrame): Summary = {
    val nodes = expand(df.queryExecution.executedPlan)
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    Summary(
      shuffles = shuffles.length,
      shuffleRecords = shuffles.map(metric(_, "shuffleRecordsWritten")).sum,
      shuffleBytes = shuffles.map(metric(_, "dataSize")).sum,
      spillBytes = nodes.map(metric(_, "spillSize")).sum,
      peakNodeOutputRows = (0L +: nodes.map(metric(_, "numOutputRows"))).max)
  }
}
