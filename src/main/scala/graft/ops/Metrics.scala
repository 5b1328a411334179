package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Execution metrics — the observability the reference never built
  * (README.md:198-204 lists monitoring as a future enhancement; no
  * counter exists anywhere in the Go codebase).
  *
  * A [[QueryExecutionListener]] records one [[QueryMetric]] per completed
  * action: wall time, output row count (when the sink reports it), scan
  * bytes, and shuffle volume pulled from the executed plan's SQL
  * metrics. Listener callbacks are fire-and-forget on the driver —
  * recording is lock-free and never throws into the query path.
  */
final case class QueryMetric(name: String, durationNs: Long,
    outputRows: Long, scanBytes: Long, shuffleBytes: Long, failed: Boolean)

final class MetricsListener extends QueryExecutionListener {
  private val buf = new ConcurrentLinkedQueue[QueryMetric]()

  /** Flatten the executed plan INCLUDING adaptive wrappers: AQE's
    * AdaptiveSparkPlanExec and query stages hide the final operators
    * from plain collect().
    */
  private def expand(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: expand(a.executedPlan)
    case s: QueryStageExec => p +: expand(s.plan)
    case other => other +: other.children.flatMap(expand)
  }

  /** Sum ONE metric key across the plan — a single node may report
    * several related metrics (an exchange has both dataSize and
    * shuffleBytesWritten; a scan has filesSize and numOutputRows), so
    * summing synonyms together would double-count in mixed units.
    */
  private def metricSum(qe: QueryExecution, name: String): Long =
    try {
      expand(qe.executedPlan).flatMap(_.metrics.collect {
        case (k, m) if k == name => m.value
      }).sum
    } catch { case _: Throwable => -1L }

  /** Row count of the TOPMOST operator that reports one — the result's
    * cardinality, not a sum over every operator in the plan.
    */
  private def rootRows(qe: QueryExecution): Long =
    try {
      expand(qe.executedPlan).iterator
        .flatMap(_.metrics.get("numOutputRows")).map(_.value)
        .nextOption().getOrElse(-1L)
    } catch { case _: Throwable => -1L }

  private def record(funcName: String, qe: QueryExecution,
      durationNs: Long, failed: Boolean): Unit =
    buf.add(QueryMetric(
      funcName,
      durationNs,
      outputRows = rootRows(qe),
      scanBytes = metricSum(qe, "filesSize"),
      shuffleBytes = metricSum(qe, "shuffleBytesWritten"),
      failed = failed))

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    record(funcName, qe, durationNs, failed = false)

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    record(funcName, qe, durationNs = -1L, failed = true)

  def snapshot(): Seq[QueryMetric] = buf.iterator().asScala.toSeq
  def clear(): Unit = buf.clear()
}

object Metrics {
  /** Install a listener on the session and return it for inspection. */
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }

  def uninstall(spark: SparkSession, l: MetricsListener): Unit =
    spark.listenerManager.unregister(l)
}
