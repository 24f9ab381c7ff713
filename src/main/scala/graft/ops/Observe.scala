package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Zero-extra-pass pipeline metrics via `Dataset.observe`: the metric
  * expressions ride the action that already runs (accumulator-style,
  * evaluated as rows stream through the plan), so counting rows/nulls/
  * totals on a 100 TB write costs NOTHING beyond the write — unlike a
  * monitor that re-scans (ValidateOps' V2/V3 are assertion monitors; this
  * is the instrumentation lane).
  *
  * Usage: `Observe.register(spark)` once per session, wrap any frame in
  * [[Observe.withMetrics]] before its action, read
  * [[Recorder.captured]] afterwards — e.g. record rows-written and
  * null-key counts of every table load into the run report.
  */
object Observe {

  /** One observation: the `observe` point's name and its metric row as a
    * name → value map.
    */
  final case class Captured(name: String, metrics: Map[String, Any])

  /** Collects observed metrics from every completed action on the
    * session. Thread-safe; `clear()` between pipeline stages if reusing.
    */
  final class Recorder extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[Captured]()

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        buf.add(Captured(name,
          row.schema.fieldNames.zipWithIndex
            .map { case (f, i) => f -> row.get(i) }.toMap))
      }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()

    def captured: Seq[Captured] = buf.asScala.toSeq
    def captured(name: String): Seq[Captured] =
      captured.filter(_.name == name)
    def clear(): Unit = buf.clear()
  }

  /** Register a fresh recorder on the session's listener bus. */
  def register(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }

  def unregister(spark: SparkSession, r: Recorder): Unit =
    spark.listenerManager.unregister(r)

  /** Block until at least one observation named `name` has been
    * delivered — the listener bus is async, so an action's metrics
    * arrive shortly AFTER the action returns. Returns the captures;
    * throws after `timeoutMs` so a wiring mistake (wrong name, metrics
    * on a frame that never ran) fails loudly instead of hanging a
    * pipeline report.
    */
  def awaitCaptured(r: Recorder, name: String,
      timeoutMs: Long = 30000): Seq[Captured] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var got = r.captured(name)
    while (got.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(10)
      got = r.captured(name)
    }
    require(got.nonEmpty,
      s"observe: no metrics named '$name' arrived within $timeoutMs ms")
    got
  }

  /** Attach named metrics to a frame; they evaluate during whatever
    * action the caller runs next. Metric expressions must be aggregates
    * over the observed rows (count/sum/min/max/...).
    */
  def withMetrics(df: DataFrame, name: String,
      first: Column, rest: Column*): DataFrame =
    df.observe(name, first, rest: _*)
}
