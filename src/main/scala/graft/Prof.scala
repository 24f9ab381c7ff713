package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (round 3). Not part of the contract. */
object Prof {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("order")) {
      SparkEntry.queries.keys.zipWithIndex.foreach { case (k, i) => println(f"$i%2d $k") }
      return
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJAGG_FALLBACK", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s -> $r")
    }
    def settle(): Unit = { spark.catalog.clearCache(); System.gc(); Thread.sleep(300) }
    def run(n: String): Long = SparkEntry.queries(n)(spark, dir).count()

    if (args.headOption.contains("explain")) {
      args.drop(1).foreach { n =>
        println(s"===== $n =====")
        SparkEntry.queries(n)(spark, dir).explain("formatted")
      }
      spark.stop()
      return
    }
    if (args.headOption.contains("entry")) {
      time("entry rows")(SparkEntry.entry(spark).count())
      spark.stop()
      return
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("x2_dedup_minhash")
    names.foreach { n =>
      time(s"$n warm")(run(n)); settle()
      time(s"$n t1")(run(n)); settle()
      time(s"$n t2")(run(n)); settle()
      time(s"$n t3")(run(n)); settle()
    }
    spark.stop()
  }
}
