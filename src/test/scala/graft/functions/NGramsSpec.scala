package graft.functions

import graft.SparkSpec
import graft.ext.Shingles
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native n-gram kernels must be BIT-IDENTICAL to the composed
  * `functions._` forms they replaced (those forms are what every oracle
  * was proved against) — including the whitespace edge cases where Java
  * `trim()` and Spark `trim()` disagree.
  */
class NGramsSpec extends SparkSpec {

  // the composed forms exactly as Shingles defined them pre-kernel
  private def composedAll(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val count = org.apache.spark.sql.functions.size(toks) - (n - 1)
    when(count >= 1,
      transform(sequence(lit(1), count),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  private def composedChar(text: Column, n: Int): Column = {
    val count = org.apache.spark.sql.functions.length(text) - (n - 1)
    when(count >= 1,
      array_distinct(transform(sequence(lit(1), count),
        i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  private val corner = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b a b a b",                  // duplicate grams: distinct order matters
    "single",
    "two words",
    "",                             // -> [""] token, no n>=2 grams
    "   ",                          // space-only: trims to ""
    "\ttab-led text\t",             // tab survives Spark trim, dies in Java trim
    "line\nbreaks\nhere and\r\nthere",
    "  leading and trailing  ",
    "unicode café naïve 日本語 😀 end",
    "a nbsp is not \\s whitespace")

  private def df = {
    import spark.implicits._
    corner.toDF("text")
  }

  test("wordNGramsAll ≡ composed form on corner cases (n=1,2,3,13)") {
    for (n <- Seq(1, 2, 3, 13)) {
      val rows = df.select(
        composedAll(col("text"), n).as("want"),
        graft.functions.NGrams.wordNGramsAll(col("text"), n).as("got"))
        .collect()
      for (r <- rows)
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n")
    }
  }

  test("wordNGrams (distinct) ≡ array_distinct of composed form") {
    for (n <- Seq(2, 3)) {
      val rows = df.select(
        array_distinct(composedAll(col("text"), n)).as("want"),
        graft.functions.NGrams.wordNGrams(col("text"), n).as("got"))
        .collect()
      for (r <- rows)
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n")
    }
  }

  test("charNGrams ≡ composed substr form, incl. multi-byte code points") {
    for (n <- Seq(1, 3, 5)) {
      val rows = df.select(
        composedChar(col("text"), n).as("want"),
        graft.functions.NGrams.charNGrams(col("text"), n).as("got"))
        .collect()
      for (r <- rows)
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n")
    }
  }

  test("Shingles wrappers keep the legacy null -> empty-array behavior") {
    import spark.implicits._
    val nulls = Seq[Option[String]](None, Some("a b c")).toDF("text")
    val out = nulls.select(
      Shingles.wordNGramsAll($"text", 2).as("all"),
      Shingles.wordNGrams($"text", 2).as("dist"),
      Shingles.charNGrams($"text", 2).as("chars")).collect()
    assert(out(0).getSeq[String](0) === Seq.empty)
    assert(out(0).getSeq[String](1) === Seq.empty)
    assert(out(0).getSeq[String](2) === Seq.empty)
    assert(out(1).getSeq[String](0) === Seq("a b", "b c"))
  }

  test("kernels stay inside whole-stage codegen") {
    // a literal Seq constant-folds to a LocalTableScan (the optimizer
    // evaluates the kernel at plan time — itself proof eval works); use a
    // non-foldable source and look for the `*(n)` codegen-stage prefix
    import spark.implicits._
    val plan = spark.range(10)
      .select(concat_ws(" ", lit("a b c"), $"id".cast("string")).as("text"))
      .select(graft.functions.NGrams.wordNGrams(col("text"), 2).as("g"))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("wordngrams"), plan)
  }
}
