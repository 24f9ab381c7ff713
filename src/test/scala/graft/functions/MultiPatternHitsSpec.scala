package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Aho-Corasick kernel must be BIT-IDENTICAL to the composed
  * array-literal form it replaced
  * (`size(filter(typedlit(probes), p => text.contains(p)))` — what q100's
  * oracle was proved against), including overlap, shared-prefix/suffix,
  * duplicate-probe, and UTF-8 edge cases — and must stay O(doclen) when
  * the probe set is orders of magnitude larger than the literal form
  * could codegen.
  */
class MultiPatternHitsSpec extends SparkSpec {

  private def composed(probes: Seq[String]) =
    org.apache.spark.sql.functions.size(
      filter(typedlit(probes), p => col("text").contains(p))).cast("long")

  private def kernel(probes: Seq[String]) =
    MultiPatternFunctions.multi_pattern_hits(col("text"), probes)

  private def check(texts: Seq[String], probes: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"), kernel(probes).as("h"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    val want = df.select(col("id"), composed(probes).as("h"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(got === want, s"probes=$probes texts=$texts")
  }

  test("equals the composed contains-filter on overlap/prefix/suffix shapes") {
    val probes = Seq("abc", "abcd", "bcd", "cd", "xyz", "aa")
    check(
      Seq(
        "abcd",            // abc, abcd, bcd, cd all present
        "zzabczz",         // abc only
        "aaa",             // aa (once — containment, not occurrences)
        "xy",              // nothing
        "",                // empty text
        "cdcdcd"),         // cd
      probes)
  }

  test("duplicate probes count separately (eval suites repeat questions)") {
    check(
      Seq("what is 7 plus 5 and more", "clean"),
      Seq("what is 7 plus ", "what is 7 plus ", "plus 5"))
  }

  test("utf-8 multibyte probes match at byte level exactly") {
    check(
      Seq("préambule: ¿qué es?", "plain ascii", "日本語のテキストです"),
      Seq("¿qué", "préam", "本語のテ", "です", "missing"))
  }

  test("one pattern inside another still reports both (dict-suffix links)") {
    check(Seq("the inner core text"), Seq("inner core", "er co", "core"))
  }

  test("null text yields null, not a crash") {
    import spark.implicits._
    val df = Seq((1L, Option("has abc")), (2L, Option.empty[String]))
      .toDF("id", "text")
    val got = df.select(col("id"),
        kernel(Seq("abc")).as("h"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) === 1L)
    assert(got(1).isNullAt(1))
  }

  test("empty patterns are rejected loudly") {
    intercept[IllegalArgumentException] {
      MultiPatternFunctions.multi_pattern_hits(col("text"), Seq("ok", ""))
    }
  }

  test("10k probes: the scale the array-literal form could not codegen") {
    import spark.implicits._
    // 10,000 distinct 16-char probes; plant 3 of them in one document
    val probes = (0 until 10000).map(i => f"probe-$i%06d-padxx")
    val doc = s"prefix ${probes(17)} mid ${probes(4242)} " +
      s"and ${probes(9999)} suffix"
    val df = Seq((1L, doc), (2L, "no hits here")).toDF("id", "text")
    val got = df.select(col("id"), kernel(probes).as("h"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(got === Seq(3L, 0L))
  }
}
