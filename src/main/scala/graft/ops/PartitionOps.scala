package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical-layout operators (SURVEY.md §2.11 L1–L2).
  *
  * Parity targets: `optimize_partition` / `optimize_partitions_by_partition_
  * columns` (spark_dataframe_service.py:197-218). L1 is intentionally eager
  * (it `count()`s — that is the reference's contract); at scale prefer AQE
  * (`spark.sql.adaptive.enabled`, on by default in our sessions) plus the
  * writer's `maxRecordsPerFile`, and reserve L1 for the final pre-write
  * stage where an exact file-count target is wanted.
  */
object PartitionOps {

  implicit class DataFramePartitionOps(val df: DataFrame) extends AnyVal {

    /** L1 — size the DataFrame to ~`recordsByPartition` rows per partition:
      * `max(count / recordsByPartition, 1)` partitions, growing via
      * `repartition` (shuffle) and shrinking via `coalesce` (no shuffle).
      */
    def optimizePartition(recordsByPartition: Long): DataFrame = {
      require(recordsByPartition > 0, "recordsByPartition must be positive")
      val rows = df.count()
      val target = math.max(rows / recordsByPartition, 1L).toInt
      if (target > df.rdd.getNumPartitions) df.repartition(target)
      else df.coalesce(target)
    }

    /** L2 — one shuffle partition per distinct partition-column tuple, so a
      * subsequent `partitionBy(cols)` write emits one file per Hive
      * partition (plus `maxRecordsPerFile` splitting when oversized).
      */
    def optimizePartitionsByPartitionColumns(partitionBy: Seq[String]): DataFrame =
      df.repartition(partitionBy.map(col): _*)
  }
}
