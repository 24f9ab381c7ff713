package graft.ops

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends SparkSpec {

  test("preFilter never drops a matching row (no false negatives)") {
    import spark.implicits._
    val probe = spark.range(0, 10000).toDF("k")
    val build = spark.range(0, 10000, 7).toDF("bk") // every 7th key
    val kept = RuntimeFilter
      .preJoinFilter(probe, "k", build, "bk", fpp = 0.05)
    // every build key's probe row survives: the semi join against build is
    // identical before and after the pre-filter
    val lostMatches = probe
      .join(build, $"k" === $"bk", "left_semi")
      .except(kept.join(build, $"k" === $"bk", "left_semi"))
    assert(lostMatches.count() === 0)
  }

  test("join downstream of the pre-filter is byte-identical to the plain join") {
    import spark.implicits._
    val probe = spark.range(0, 5000).toDF("k")
      .withColumn("v", $"k" * 2)
    val build = spark.range(0, 5000, 13).toDF("bk")
    val plain = probe.join(build, $"k" === $"bk").agg(
      count(lit(1)).as("n"), sum("v").as("s"))
    val filtered = RuntimeFilter.preJoinFilter(probe, "k", build, "bk")
      .join(build, $"k" === $"bk").agg(
        count(lit(1)).as("n"), sum("v").as("s"))
    assert(plain.collect().toSeq === filtered.collect().toSeq)
  }

  test("pre-filter rate is near fpp: selective build prunes the probe hard") {
    import spark.implicits._
    val probe = spark.range(0, 20000).toDF("k")
    val build = spark.range(0, 20000, 100).toDF("bk") // 1% of keys
    val kept = RuntimeFilter
      .preJoinFilter(probe, "k", build, "bk", fpp = 0.01).count()
    // 200 true keys + ~1% fp of the 19800 non-matching rows; allow 3x slack
    assert(kept >= 200 && kept <= 200 + 3 * 198)
  }

  test("string keys probe the same bytes the build inserted") {
    import spark.implicits._
    val probe = spark.range(0, 2000)
      .select(concat(lit("doc-"), $"id").as("k"))
    val build = spark.range(0, 2000, 5)
      .select(concat(lit("doc-"), $"id").as("bk"))
    val kept = RuntimeFilter.preJoinFilter(probe, "k", build, "bk")
    val lost = probe.join(build, $"k" === $"bk", "left_semi")
      .except(kept.join(build, $"k" === $"bk", "left_semi"))
    assert(lost.count() === 0)
  }

  test("pre-filter is narrow: no Exchange added to the probe scan") {
    import spark.implicits._
    val probe = spark.range(0, 1000).toDF("k")
    val build = spark.range(0, 1000, 9).toDF("bk")
    val pruned = RuntimeFilter.preJoinFilter(probe, "k", build, "bk")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // and the probe stays inside whole-stage codegen: the `*(n)` prefix
    // marks codegen stages in the plan string
    assert("""\*\(\d+\) Filter bloommightcontain""".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("save/load round-trips the filter through a file") {
    import spark.implicits._
    val build = spark.range(0, 1000, 3).toDF("bk")
    val bf = RuntimeFilter.buildBloom(build, "bk")
    val dir = File.createTempFile("bloom", "")
    dir.delete()
    val path = new File(dir, "build.bloom").getPath
    RuntimeFilter.save(bf, path, build)
    val loaded = RuntimeFilter.load(path, build)
    assert((0L until 1000L by 3).forall(loaded.mightContainLong))
    assert(loaded.bitSize() === bf.bitSize())
  }
}
