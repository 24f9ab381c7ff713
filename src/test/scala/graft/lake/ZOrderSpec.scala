package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SearchSorted

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, bit-at-a-time. */
  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    val d = vals.length
    for (i <- 0 until bits; j <- 0 until d)
      z |= ((vals(j) >> i) & 1L) << (i * d + j)
    z
  }

  test("2-D magic-mask interleave matches the bit-at-a-time reference") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val df = rows.toDF("a", "b")
      .withColumn("z", ZOrder.interleave(Seq(col("a"), col("b")), 16))
    val got = df.select("a", "b", "z").collect()
    got.foreach { r =>
      r.getLong(2) shouldBe mortonRef(Seq(r.getLong(0), r.getLong(1)), 16)
    }
  }

  test("3-D generic interleave matches the reference and stays in range") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)(
      (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = rows.toDF("a", "b", "c")
      .withColumn("z",
        ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 8))
    df.collect().foreach { r =>
      val z = r.getLong(3)
      z shouldBe mortonRef(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 8)
      assert(z >= 0 && z < (1L << 24))
    }
  }

  test("SearchSorted: upper-bound bucketing with ties, ends, and nulls") {
    val bounds = Seq(1.0, 2.0, 2.0, 5.0)
    val df = Seq[java.lang.Double](0.5, 1.0, 1.5, 2.0, 3.0, 5.0, 9.0, null)
      .toDF("v")
      .select(col("v"), SearchSorted(col("v"), bounds).as("b"))
    df.collect().map(r => if (r.isNullAt(1)) -1 else r.getInt(1)) shouldBe
      Array(0, 1, 1, 3, 3, 4, 4, -1)
  }

  test("quantile bucketing spreads a skewed column over the bucket range") {
    // zipf-ish skew: most mass at tiny values, long tail
    val vals = (1 to 4000).map(i => (i * i).toLong)
    val df = vals.toDF("v")
    val buckets = df
      .select(coalesce(ZOrder.quantileBucket(df, "v", 4), lit(0)).as("b"))
      .groupBy("b").count().collect()
    // quantile (not min/max) bucketing: at least half the 16 buckets used,
    // and no bucket hoards more than 30% of rows
    buckets.length should be >= 8
    buckets.map(_.getLong(1)).max.toDouble / vals.size should be < 0.3
  }

  test("z-order layout yields tighter per-file bounds than round-robin") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")

    def fileStats(path: String): Array[(Double, Double)] = {
      val df = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
          min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      df.collect().map { r =>
        (r.getLong(2) - r.getLong(1) + 1.0, r.getLong(4) - r.getLong(3) + 1.0)
      }
    }

    val base = new java.io.File(
      graft.Scratch.fastLocalDir().getOrElse(sys.props("java.io.tmpdir")),
      s"zorder-spec-${System.nanoTime()}")
    val zPath = new java.io.File(base, "z").getPath
    val rPath = new java.io.File(base, "r").getPath
    try {
      ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), numFiles = 16)
        .write.mode("overwrite").parquet(zPath)
      li.repartition(16).write.mode("overwrite").parquet(rPath)

      val Seq(pSpan, sSpan) = Seq("l_partkey", "l_suppkey").map { c =>
        val mm = li.agg(min(c), max(c)).head()
        mm.getLong(1) - mm.getLong(0) + 1.0
      }
      // avg fraction of the 2-D key space a file's bounding box covers:
      // the pruning probability for a uniform point/range predicate
      def avgBox(stats: Array[(Double, Double)]): Double =
        stats.map { case (p, s) => (p / pSpan) * (s / sSpan) }.sum / stats.length

      val zBox = avgBox(fileStats(zPath))
      val rBox = avgBox(fileStats(rPath))
      // round-robin files each cover ~the whole space (box ≈ 1); 16 files
      // on a 2-D curve should sit around 1/16 each — insist on 4× better
      zBox should be < rBox / 4.0
      // and pruning must actually fire: a point predicate on EITHER column
      // alone should skip most files
      val zStats = fileStats(zPath)
      val hitP = zStats.count { case (p, _) => p > pSpan / 2 }
      hitP.toDouble / zStats.length should be < 0.5
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(base)
    }
  }
}
