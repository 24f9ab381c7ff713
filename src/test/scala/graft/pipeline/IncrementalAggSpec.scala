package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val spec = (Seq("g"), Seq("v"), Seq("v"), Seq("u"))

  private def summarize(df: DataFrame) =
    IncrementalAgg.summarize(df, spec._1, spec._2, spec._3, spec._4)

  private def data = (1 to 1000).map { i =>
    (if (i % 3 == 0) "a" else "b", i.toDouble, (i % 97).toLong)
  }.toDF("g", "v", "u")

  test("merge of slice summaries equals the full-scan summary") {
    val slices = Seq(
      data.filter(col("v") <= 300),
      data.filter(col("v") > 300 && col("v") <= 700),
      data.filter(col("v") > 700))
    val merged = IncrementalAgg.estimate(
      IncrementalAgg.merge(slices.map(summarize),
        spec._1, spec._2, spec._3, spec._4), spec._4)
    val full = IncrementalAgg.estimate(summarize(data), spec._4)

    val m = merged.orderBy("g").collect()
    val f = full.orderBy("g").collect()
    m.length shouldBe f.length
    m.zip(f).foreach { case (a, b) =>
      a.getString(0) shouldBe b.getString(0)
      a.getLong(1) shouldBe b.getLong(1)            // n adds exactly
      a.getDouble(2) shouldBe b.getDouble(2) +- 1e-6 // sum_v
      a.getDouble(3) shouldBe b.getDouble(3)        // min_v
      a.getDouble(4) shouldBe b.getDouble(4)        // max_v
      a.getLong(5) shouldBe b.getLong(5)            // sketch union == one-shot sketch
    }
  }

  test("exact stats match a direct groupBy; ndv estimate within 5%") {
    val est = IncrementalAgg.estimate(summarize(data), Seq("u"))
      .orderBy("g").collect()
    val direct = data.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        countDistinct("u").as("ndv"))
      .orderBy("g").collect()
    est.zip(direct).foreach { case (a, b) =>
      a.getLong(1) shouldBe b.getLong(1)
      a.getDouble(2) shouldBe b.getDouble(2) +- 1e-6
      val exact = b.getLong(3).toDouble
      math.abs(a.getLong(5) - exact) / exact should be < 0.05
    }
  }

  test("a group present in only one slice survives the merge") {
    val s1 = summarize(Seq(("only", 1.0, 1L)).toDF("g", "v", "u"))
    val s2 = summarize(data)
    val merged = IncrementalAgg.merge(Seq(s1, s2),
      spec._1, spec._2, spec._3, spec._4)
    merged.filter(col("g") === "only").count() shouldBe 1
  }

  test("merge cost is over summary rows (plan reads no base data)") {
    val s = summarize(data)
    val merged = IncrementalAgg.merge(Seq(s, s), spec._1, spec._2,
      spec._3, spec._4)
    // folding two cached/written summaries is one union + one agg
    val plan = merged.queryExecution.optimizedPlan.toString
    assert(plan.contains("Union"), plan)
  }
}
