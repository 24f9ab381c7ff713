package graft.ops

import graft.SparkSpec
import graft.ops.PartitionOps._

class PartitionOpsSpec extends SparkSpec {

  test("L1 partition math: grows via repartition, shrinks via coalesce") {
    import spark.implicits._
    val df = spark.range(1000).toDF("id").repartition(4)
    // 1000 rows / 100 per partition -> 10 partitions (grow)
    assert(df.optimizePartition(100).rdd.getNumPartitions === 10)
    // 1000 rows / 600 per partition -> max(1,1)=1 partition (shrink)
    assert(df.optimizePartition(600).rdd.getNumPartitions === 1)
    // huge target never drops below one partition
    assert(df.optimizePartition(1000000).rdd.getNumPartitions === 1)
  }

  test("L1 rejects non-positive targets") {
    val df = spark.range(10).toDF("id")
    intercept[IllegalArgumentException] { df.optimizePartition(0) }
  }

  test("L2 repartition by partition columns co-locates each tuple") {
    import spark.implicits._
    val df = spark.range(100).toDF("id")
      .withColumn("p", ($"id" % 3).cast("int"))
      .optimizePartitionsByPartitionColumns(Seq("p"))
    // every partition-column value lands in exactly one RDD partition
    val spread = df.rdd
      .mapPartitionsWithIndex { case (i, rows) =>
        rows.map(r => (r.getAs[Int]("p"), i)).toSet.iterator
      }
      .collect().groupBy(_._1).view.mapValues(_.length)
    spread.foreach { case (_, n) => assert(n === 1) }
  }
}
