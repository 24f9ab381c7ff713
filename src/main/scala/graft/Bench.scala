package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query and prints the totals as
  * JSON on stdout.
  *
  * Artifact-safety (a throttled host once timed out the whole run and
  * discarded everything it had measured): after EVERY query's median
  * completes, the FULL cumulative state is re-printed as one JSON line —
  * so the last stdout line is always a complete, parseable record of
  * everything measured so far, no matter where a timeout lands. A
  * wall-clock budget (`SPARK_GRAFT_BENCH_BUDGET_S`, default 1200) degrades
  * the per-query passes 3 → 1 at 50% spent and stops timing new queries
  * at 95% spent (reported in `skipped`), rather than overshooting the
  * driver's deadline and forfeiting the artifact.
  *
  * Tail-proofing: the cumulative line grows with the query count (~12 KB
  * at 141 queries) and a capture that keeps only the last ~2000 chars of
  * stdout loses the leading `"value":…` — so after each cumulative line a
  * second, compact totals-only line is printed. The LAST line of any
  * stdout tail >= 200 chars therefore always parses to the headline
  * numbers.
  *
  * File artifact: stdout through sbt arrives `[info] `-prefixed (and sbt
  * appends its own `[success]` line after ours), so a parser that takes
  * the literal last stdout line never sees valid JSON. The full
  * cumulative record is therefore ALSO written to `BENCH_LOCAL.json`
  * (override via `SPARK_GRAFT_BENCH_OUT`) after every query — atomically
  * (tmp + rename), so a reader never observes a half-written record and a
  * timeout still leaves the last complete state on disk — the same
  * land-it-in-a-file posture as Verify's `oracle_sql.json`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1200").toDouble
    // optional comma-separated query filter for focused local re-runs
    // (the driver never sets it, so its runs always time everything)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    def selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val spark = Scratch.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // default 100 entries evicts early queries' generated classes before
      // their timed run (~75 queries x several codegen stages), silently
      // re-charging Janino compilation to the timed pass
      .config("spark.sql.codegen.cache.maxEntries", "5000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val data = Scratch.stage(sfDir)
    val start = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - start) / 1e9
    // Between timed passes: drop persisted intermediates, then force a JVM
    // GC. The GC is bench hygiene, not a speed hack — unpersist is async,
    // and Spark's ContextCleaner only releases the previous query's shuffle
    // files/broadcasts when their dependency objects are COLLECTED; on a
    // large barely-collected heap that debris lands in whichever query runs
    // next (measured: the query after the heaviest shuffle producer ran 5x
    // its steady state). The 100 ms beat lets the cleaner thread delete
    // files here (untimed) instead of inside the next query.
    def settle(): Unit = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(100)
      // localCheckpoint blocks (x7's per-round lineage truncation) are
      // released by the ContextCleaner asynchronously AFTER the GC above;
      // without draining them here the block-drop messages land inside the
      // NEXT timed pass (measured: x7 spread 1.86 vs <=0.4 for every other
      // query). GENTLE drain: at most 4 extra GC+beat rounds — a tight
      // gc-every-50ms loop (the first attempt) forced ~25 full STW
      // collections per settle on a 64 GB heap, and that heap churn
      // itself stalled the next timed pass by tens of seconds.
      var tries = 0
      while (tries < 4 &&
          org.apache.spark.sql.GraftShim.pendingRddBlocks() > 0) {
        System.gc()
        Thread.sleep(150)
        tries += 1
      }
    }
    // Warm EVERY query once before timing: whole-stage codegen compilation
    // (Janino) and JIT dominate cold single-query latency at this data
    // scale (measured 3-7x the steady-state time) and are one-time costs a
    // long-running cluster never re-pays — the timed pass below measures
    // execution, which is what scales with data. Warm runs are untimed, so
    // they skip the GC settle (debris between warms lands in other warms);
    // under a tight budget warming stops at 40% spent and the affected
    // queries pay codegen in their first timed pass instead — degraded
    // accuracy beats a forfeited artifact.
    selected.takeWhile(_ => elapsed() < budgetS * 0.4)
      .foreach { case (_, fn) =>
        try fn(spark, data).count() catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    settle()
    // Median-of-3 per query: single-shot timings on a 32-thread local JVM
    // drift ±25% run-to-run (GC pauses, shuffle-file cleanup, JIT
    // recompiles), which is the same order as a real regression on a
    // sub-second query — the median filters the one-off stalls, and the
    // recorded spread says how much to trust each number. Failures are
    // reported as -1 and excluded from the total so a broken query can
    // never make the bench look faster.
    val declared = selected.size
    val results = collection.mutable.LinkedHashMap[String, (Boolean, Double, Double, Int)]()
    def emit(skipped: Int): Unit = {
      def jmap(f: ((Boolean, Double, Double, Int)) => Double) = results
        .map { case (k, v @ (ok, _, _, _)) =>
          "\"" + k + "\":" + (if (ok) f(v) else -1.0)
        }
        .mkString("{", ",", "}")
      val qs = jmap { case (_, med, _, _) => med }
      val spreads = jmap { case (_, _, sp, _) => math.rint(sp * 1000) / 1000 }
      val passes = results
        .map { case (k, (_, _, _, p)) => "\"" + k + "\":" + p }
        .mkString("{", ",", "}")
      val failed = results.count { case (_, (ok, _, _, _)) => !ok }
      val total = results.collect { case (_, (true, v, _, _)) => v }.sum
      val t = math.rint(total * 1000) / 1000
      val full = s"""{"metric":"total","value":$t,"unit":"sec","queries":$qs,"spread":$spreads,"passes":$passes,"failed":$failed,"completed":${results.size},"declared":$declared,"skipped":$skipped,"elapsed_s":${math.rint(elapsed())},"sf":"$sfDir"}"""
      println(full)
      // compact totals-only duplicate: survives any stdout-tail capture
      println(s"""{"metric":"total","value":$t,"unit":"sec","failed":$failed,"completed":${results.size},"declared":$declared,"skipped":$skipped,"elapsed_s":${math.rint(elapsed())},"sf":"$sfDir"}""")
      // machine-parseable file artifact (atomic: write tmp, then rename)
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
      val tmp = out.resolveSibling(out.getFileName.toString + ".tmp")
      try {
        java.nio.file.Files.writeString(tmp, full + "\n")
        java.nio.file.Files.move(tmp, out,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch { case e: Exception =>
        System.err.println(s"[bench] could not write $out: ${e.getMessage}")
      }
    }
    val names = selected.keys.toSeq
    var done = 0
    names.foreach { name =>
      if (elapsed() >= budgetS * 0.95) ()
      else {
        val fn = SparkEntry.queries(name)
        val passes = if (elapsed() < budgetS * 0.5) 3 else 1
        val times = (1 to passes).flatMap { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, data).count(); true }
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
        results(name) = (times.nonEmpty, median, spread, passes)
        done += 1
        emit(declared - done)
      }
    }
    spark.stop()
  }
}
