package graft.pipeline

import java.time.LocalDate

import scala.concurrent.duration._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.lake.{Layer, Metastore, TableWriter}
import graft.ops.ColumnOps._

/** §3.2 — the per-table SQL load, in-process.
  *
  * The reference ships this as an Airflow sub-DAG per table that submits a
  * remote `load_table.py` job over the Databricks REST API with parameters
  * `[env, bucket, layer, src_db, tgt_db, query_path, table, partitions,
  * run_date, is_incremental, spark_params]`
  * (etl_projects/base/processors/builders/datalake_sub_dag_builder.py:
  * 96-117); the job itself is not in the repo, so these semantics are the
  * contract reconstructed from that parameter list (SURVEY.md §3.2 step 4):
  * run the table's SQL against the source layer, normalize column names,
  * stamp run-date partition columns when incremental, write partitioned to
  * the target layer, register in the catalog.
  *
  * The control-plane state machines (REST retries, cluster lifecycle —
  * SURVEY.md §2.12) are orchestration, not query capability; in-process
  * sequencing plus the driver harness replaces them.
  *
  * Scale posture: incremental loads write with dynamic partition overwrite
  * (only the run date's partitions are replaced — re-runs are idempotent
  * without rewriting the table), and each load pre-shuffles by the partition
  * columns so a 1000-executor write emits one file per Hive partition.
  */
object TableLoad {

  final case class Spec(
      source: String,
      table: String,
      query: String,
      targetLayer: Layer,
      partitions: Seq[String] = Nil,
      runDate: Option[LocalDate] = None,
      incremental: Boolean = false,
      formatNames: Boolean = true,
      registerTable: Boolean = true)

  /** Run one table load; returns the DataFrame that was written. */
  def run(spark: SparkSession, metastore: Metastore, spec: Spec): DataFrame = {
    val queried = spark.sql(spec.query)
    val named = if (spec.formatNames) queried.formatColumnNames() else queried

    val stamped = (spec.incremental, spec.runDate) match {
      case (true, Some(d)) if !named.columns.contains("year") =>
        named.withYearMonthDayFromDate(d)
      case _ => named
    }

    val path = metastore.tablePath(spec.targetLayer, spec.source, spec.table)
    val writerSpec = TableWriter.Spec(
      layer = spec.targetLayer,
      path = path,
      partitionBy = spec.partitions,
      onePartitionFilePerValue = spec.partitions.nonEmpty,
      dynamicPartitionOverwrite = spec.incremental)
    TableWriter.write(stamped, writerSpec)

    if (spec.registerTable) {
      val db = metastore.datalakeDatabase(spec.source, spec.targetLayer)
      TableWriter.registerExternalTable(spark, db, spec.table, writerSpec,
        schema = Some(stamped.schema))
    }
    stamped
  }

  /** Sequence several loads (the sub-DAG fan-out, collapsed in-process). */
  def runAll(
      spark: SparkSession,
      metastore: Metastore,
      specs: Seq[Spec]): Seq[DataFrame] =
    specs.map(run(spark, metastore, _))

  /** The reference's per-task retry knobs, defaults included: every DAG
    * task runs with `retries=3`, `retry_delay=3 min`, and a 2-hour
    * `execution_timeout` (etl_projects/base/orchestration/base_dag.py:9-14;
    * the Databricks REST poll layer retries with the same shape,
    * databricks_plugin.py:87-93,297-303).
    *
    * `timeout` here is a DEADLINE ON STARTING ATTEMPTS, not a hard kill:
    * once `timeout` has elapsed since the first attempt began, no further
    * retry starts and the last failure propagates. Pre-empting a running
    * Spark job mid-flight is the orchestrator's job (Airflow kills the
    * task process; in-process that would mean job-group cancellation with
    * a partially-written target) — and every load is idempotent anyway:
    * targets are written with overwrite / dynamic-partition-overwrite, so
    * a re-run after a mid-write failure converges.
    */
  final case class RetryPolicy(
      retries: Int = 3,
      delay: FiniteDuration = 3.minutes,
      timeout: FiniteDuration = 2.hours)

  /** [[run]] under [[RetryPolicy]] — the §3.2 load with the reference's
    * fault tolerance. A transient failure (lost executor wave, catalog
    * hiccup, eventually-consistent listing) is retried after `delay`, up
    * to `retries` additional attempts within the `timeout` deadline.
    */
  def runWithRetry(
      spark: SparkSession,
      metastore: Metastore,
      spec: Spec,
      policy: RetryPolicy = RetryPolicy(),
      sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)): DataFrame =
    retry(policy, sleep)(run(spark, metastore, spec))

  /** Retry harness behind [[runWithRetry]], package-visible so specs can
    * drive it with an injected failing body and a recording `sleep` (no
    * real three-minute waits in tests). Fatal errors (OOM, linkage) are
    * not retried — rethrown immediately via `NonFatal`.
    */
  private[pipeline] def retry[T](
      policy: RetryPolicy,
      sleep: FiniteDuration => Unit)(body: => T): T = {
    val deadline = policy.timeout.fromNow
    var attempt = 0
    var last: Throwable = null
    while (attempt <= policy.retries) {
      if (attempt > 0) sleep(policy.delay)
      try return body
      catch {
        case scala.util.control.NonFatal(e) =>
          last = e
          attempt += 1
          if (attempt > policy.retries)
            throw new RuntimeException(
              s"TableLoad: failed after ${attempt} attempts " +
                s"(retries=${policy.retries})", e)
          if (deadline.isOverdue())
            throw new RuntimeException(
              s"TableLoad: attempt ${attempt} failed and the " +
                s"${policy.timeout} execution deadline has passed; " +
                "not retrying", e)
      }
    }
    throw last // unreachable: loop exits only via return/throw
  }
}
