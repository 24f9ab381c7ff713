package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq[(java.lang.Long, java.lang.Double, String)](
    (1L, 1.5, "a"), (2L, null, "b"), (3L, 2.5, null), (3L, -1.0, "a"))
    .toDF("k", "v", "s")

  test("profile: one row per column with family-typed min/max") {
    val p = Profile.profile(df, exactNdv = true)
      .orderBy("column").collect()
    p.map(_.getString(0)) shouldBe Array("k", "s", "v")

    val k = p(0)
    (k.getLong(1), k.getLong(2), k.getLong(3)) shouldBe ((4L, 4L, 3L))
    (k.getDouble(4), k.getDouble(5)) shouldBe ((1.0, 3.0))
    assert(k.isNullAt(6) && k.isNullAt(7))

    val s = p(1)
    (s.getLong(2), s.getLong(3)) shouldBe ((3L, 2L))
    assert(s.isNullAt(4) && s.isNullAt(5))
    (s.getString(6), s.getString(7)) shouldBe (("a", "b"))

    val v = p(2)
    (v.getLong(2), v.getLong(3)) shouldBe ((3L, 3L))
    (v.getDouble(4), v.getDouble(5)) shouldBe ((-1.0, 2.5))
  }

  test("profile: column subset and approx ndv stays within HLL error") {
    val big = spark.range(10000).toDF("id")
      .withColumn("m", col("id") % 1000)
    val p = Profile.profile(big, cols = Seq("m")).collect()
    p.length shouldBe 1
    val ndv = p.head.getLong(3)
    // HLL++ at default rsd 5%
    assert(math.abs(ndv - 1000) <= 150, s"approx ndv $ndv too far from 1000")
  }

  test("profile is a single aggregation (no join, one pair of exchanges)") {
    val plan = Profile.profile(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("keySkew: counts, shares, and integer salt suggestions") {
    // 64 rows of 'hot', 8 of 'warm', 1 each of 4 cold keys
    val rows = Seq.fill(64)("hot") ++ Seq.fill(8)("warm") ++
      Seq("c1", "c2", "c3", "c4")
    val out = Profile.keySkew(rows.toDF("k"), "k", topK = 3, tasks = 4)
      .collect()
    out.map(_.getString(0)) shouldBe Array("hot", "warm", "c1")
    out.map(_.getLong(1)) shouldBe Array(64L, 8L, 1L)
    // total = 76; hot: ceil(64*4/76) = ceil(3.37) = 4; warm: ceil(8*4/76)=1
    out.map(_.getLong(3)) shouldBe Array(4L, 1L, 1L)
    out.head.getDouble(2) shouldBe (64.0 / 76.0) +- 1e-12
  }

  test("keySkew: deterministic tie-break on the key value") {
    val rows = Seq("b", "b", "a", "a", "c")
    val out = Profile.keySkew(rows.toDF("k"), "k", topK = 3).collect()
    out.map(_.getString(0)) shouldBe Array("a", "b", "c")
  }

  test("robustOutliers: spike flagged, bulk not, stats are median/MAD") {
    // group g: values 1..9 (median 5, MAD 2) plus a 1e6 spike
    val data = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 1e6))
      .toDF("k", "v")
    val out = Profile.robustOutliers(data, Seq("k"), "v", k = 3.5,
      exact = true).collect()
    val byV = out.map(r => r.getDouble(1) ->
      (r.getDouble(2), r.getDouble(3), r.getBoolean(5))).toMap
    // median of 1..9,1e6 = 5.5; MAD = median(|v-5.5|) = 2.5
    val (med, mad, _) = byV(1e6)
    med shouldBe 5.5 +- 1e-9
    mad shouldBe 2.5 +- 1e-9
    byV(1e6)._3 shouldBe true
    (1 to 9).foreach(v => byV(v.toDouble)._3 shouldBe false)
    // the spike cannot poison the baseline: a mean/stddev z-score of the
    // same spike is ~3.0 (below threshold) because it inflates sigma
    val n = 10.0
    val mean = ((1 to 9).sum + 1e6) / n
    val sd = math.sqrt(
      (((1 to 9).map(v => math.pow(v - mean, 2)).sum) +
        math.pow(1e6 - mean, 2)) / n)
    ((1e6 - mean) / sd) should be < 3.5
  }

  test("robustOutliers: MAD=0 group scores null and flags nothing") {
    val data = (Seq.fill(6)(7.0) :+ 100.0).map(("g", _)).toDF("k", "v")
    val out = Profile.robustOutliers(data, Seq("k"), "v", exact = true)
      .collect()
    out.foreach { r =>
      r.isNullAt(4) shouldBe true // robust_z
      r.getBoolean(5) shouldBe false
    }
  }

  test("equiDepthHistogram: near-equal depths, contiguous exact ranges") {
    val data = (1 to 1000).map(v => Tuple1(v.toDouble)).toDF("v")
    val h = Profile.equiDepthHistogram(data, "v", buckets = 4, exact = true)
      .orderBy("bucket").collect()
    h.map(_.getInt(0)) shouldBe Array(0, 1, 2, 3)
    h.map(_.getLong(1)).sum shouldBe 1000L
    all(h.map(_.getLong(1))) shouldBe 250L +- 1L
    // ranges tile the data: each bucket's max < next bucket's min
    h.sliding(2).foreach { case Array(a, b) =>
      a.getDouble(3) should be < b.getDouble(2)
    case _ => }
    h.head.getDouble(2) shouldBe 1.0
    h.last.getDouble(3) shouldBe 1000.0
  }

  test("equiDepthHistogram: heavy-tie data keeps every row, ranges ordered") {
    // 90% of mass at one value collapses several boundaries onto it; the
    // inseparable tied mass lands in ONE bucket (ties-upper convention),
    // nothing is lost, and surviving ranges stay disjoint and ordered
    val data = (Seq.fill(900)(5.0) ++ (1 to 100).map(_.toDouble * 1000))
      .map(Tuple1(_)).toDF("v")
    val h = Profile.equiDepthHistogram(data, "v", buckets = 4, exact = true)
      .orderBy("bucket").collect()
    h.map(_.getLong(1)).sum shouldBe 1000L
    h.length should be <= 4
    val spikeBucket = h.find(_.getDouble(2) == 5.0).get
    spikeBucket.getLong(1) should be >= 900L
    h.sliding(2).foreach { case Array(a, b) =>
      a.getDouble(3) should be < b.getDouble(2)
    case _ => }
  }

  test("joinCardinality: exact inner-join output count and advice tiers") {
    val left = (Seq.fill(50)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val right = (Seq.fill(40)("hot") ++ Seq("a", "a", "z")).toDF("k")
    val r = Profile.joinCardinality(left, right, "k",
      broadcastRowThreshold = 10).head()
    r.getLong(0) shouldBe 53L // n_left
    r.getLong(1) shouldBe 43L // n_right
    r.getLong(2) shouldBe 2L  // keys matched: hot, a
    // exact: 50*40 + 1*2 = 2002 — verified against the real join
    r.getLong(3) shouldBe 2002L
    left.join(right, "k").count() shouldBe 2002L
    r.getLong(4) shouldBe 2000L
    r.getString(6) shouldBe "salt_skew" // right too big to broadcast, hot dominates
    // a small right side flips to broadcast regardless of skew
    Profile.joinCardinality(left, right, "k",
      broadcastRowThreshold = 1000).head().getString(6) shouldBe
      "broadcast_right"
    // no dominant key and no broadcast -> shuffle
    val l2 = (1 to 100).map(i => s"k$i").toDF("k")
    Profile.joinCardinality(l2, l2, "k", broadcastRowThreshold = 10)
      .head().getString(6) shouldBe "shuffle"
  }

  test("robustOutliers: groups are scored independently") {
    val data = (Seq.fill(9)(("a", 1.0)) ++ Seq(("a", 2.0)) ++
      (1 to 9).map(v => ("b", v.toDouble)) :+ (("b", 1000.0)))
      .toDF("k", "v")
    val out = Profile.robustOutliers(data, Seq("k"), "v", exact = true)
      .filter(col("is_outlier")).collect()
    out.map(r => (r.getString(0), r.getDouble(1))).toSet shouldBe
      Set(("b", 1000.0))
  }
}
