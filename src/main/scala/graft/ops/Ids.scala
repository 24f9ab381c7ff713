package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Contiguous global row ids in a declared order — WITHOUT the
  * single-task trap. The obvious formulation,
  * `row_number().over(Window.orderBy(...))`, moves the entire dataset to
  * ONE task (Spark even warns); at 100 TB that is not slow, it is dead.
  * `monotonically_increasing_id` is distributed but neither contiguous
  * nor order-respecting.
  *
  * This is the scale shape: one range shuffle puts rows in global order
  * across partitions, an in-partition sort finishes the order, and
  * `zipWithIndex` assigns offsets from an O(partitions) count pass —
  * the same two-phase prefix-scan idea as the sequence packer. The RDD
  * hop is the justified kind: per-partition imperative indexing that no
  * declarative operator expresses.
  *
  * `orderCols` must totally order the data (include a unique key last):
  * range partitioning splits equal keys across partition boundaries
  * arbitrarily, so a non-total order would make ids nondeterministic.
  */
object Ids {

  def withGlobalIds(df: DataFrame, orderCols: Seq[Column],
      idCol: String = "gid", numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "withGlobalIds needs order columns")
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val ordered = df
      .repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = ordered.schema.add(StructField(idCol, LongType, nullable = false))
    val rows = ordered.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}
