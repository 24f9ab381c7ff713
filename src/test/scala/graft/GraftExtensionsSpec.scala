package graft

/** Uses the shared session + `GraftExtensions.install` (the live-session
  * path); the `spark.sql.extensions` class delegates to the same
  * registration table, so this covers the builders for both entry points.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("graft functions are callable from plain SQL after install") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      """SELECT
        |  graft_minhash(array('a', 'b', 'c'), 4) AS mh,
        |  graft_simhash64(array('a', 'b')) AS sh,
        |  graft_simhash64(array('a', 'b'), 7) AS sh7,
        |  graft_jaccard_sorted(array('a', 'b'), array('b', 'c')) AS j,
        |  graft_vector_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
        |                   array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS dot,
        |  graft_vector_norm(array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS nrm,
        |  graft_xxhash64_seeded('x', 5) AS xx
        |""".stripMargin).head()
    assert(row.getSeq[Long](0).length === 4)
    assert(row.getLong(1) !== row.getLong(2)) // seed changes the signature
    assert(row.getDouble(3) === 1.0 / 3.0)
    assert(row.getDouble(4) === 11.0)
    assert(row.getDouble(5) === 5.0)

    // SQL result agrees with the Scala API (same expression underneath)
    import org.apache.spark.sql.functions.lit
    import graft.functions.HashFunctions
    val viaApi = spark.range(1)
      .select(HashFunctions.xxhash64_seeded(lit("x"), 5L).as("xx"))
      .head().getLong(0)
    assert(row.getLong(6) === viaApi)

    // bad arity fails with the usage message, not an internal error
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'))").head()
    }
    assert(e.getMessage.contains("graft_minhash"))
  }

  test("n-gram and int8 kernels are callable from SQL") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      """SELECT
        |  graft_word_ngrams('a b c', 2) AS wg,
        |  graft_char_ngrams('abc', 2) AS cg,
        |  graft_vector_max_abs(array(CAST(-3 AS FLOAT), CAST(2 AS FLOAT)))
        |    AS ma,
        |  graft_vector_int8_dot(
        |    graft_vector_quantize_int8(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))),
        |    graft_vector_quantize_int8(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))))
        |    AS dot
        |""".stripMargin).head()
    assert(row.getSeq[String](0) === Seq("a b", "b c"))
    assert(row.getSeq[String](1) === Seq("ab", "bc"))
    assert(row.getDouble(2) === 3.0)
    assert(row.getLong(3) === 127L * 127L)
  }

  test("negative integer literals work as SQL seeds") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT graft_xxhash64_seeded('x', -1) AS a, " +
        "graft_simhash64(array('a'), -7) AS b").head()
    import org.apache.spark.sql.functions.lit
    val viaApi = spark.range(1)
      .select(graft.functions.HashFunctions.xxhash64_seeded(lit("x"), -1L))
      .head().getLong(0)
    assert(r.getLong(0) === viaApi)
  }

  test("winnow and deletion-hash kernels are callable from SQL") {
    GraftExtensions.install(spark)
    import org.apache.spark.sql.functions.{col, lit}
    val sql = spark.sql(
      "SELECT graft_winnow('the quick brown fox jumps', 5, 4) AS w, " +
        "graft_winnow('the quick brown fox jumps', 5, 4, false) AS wf, " +
        "graft_deletion_hashes('abc', 1) AS d").head()
    val api = spark.range(1).select(
      graft.functions.Winnow.fingerprints(
        lit("the quick brown fox jumps"), 5, 4).as("w"),
      org.apache.spark.sql.GraftShim.column(
        graft.functions.DeletionHashes(
          org.apache.spark.sql.GraftShim.expression(lit("abc")), 1))
        .as("d")).head()
    sql.getSeq[Long](0) shouldBe api.getSeq[Long](0)
    sql.getSeq[Long](2) shouldBe api.getSeq[Long](1)
    // the XXH64 mode selects the same COUNT shape but different values
    sql.getSeq[Long](1).nonEmpty shouldBe true
  }

  test("quantile sketch build/merge/probe are callable from SQL") {
    GraftExtensions.install(spark)
    import spark.implicits._
    (1 to 1000).map(i => (i % 4, i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("qs_in")
    val row = spark.sql(
      """SELECT graft_quantile_sketch_get(
        |  graft_quantile_sketch_merge(sk), 0.5, 0.9) AS q
        |FROM (SELECT g, graft_quantile_sketch(v, 0.01) AS sk
        |      FROM qs_in GROUP BY g)""".stripMargin).head()
    val Seq(q50, q90) = row.getSeq[Double](0).toSeq
    q50 shouldBe 500.0 +- 40.0
    q90 shouldBe 900.0 +- 40.0
  }

  test("bitmap, positional-ngram, and moments kernels are callable from SQL") {
    GraftExtensions.install(spark)
    // positional char n-grams keep duplicates
    spark.sql("SELECT graft_char_ngrams('ababa', 3, false) AS g")
      .head().getSeq[String](0) shouldBe Seq("aba", "bab", "aba")
    // disjoint sets: every left bit is a left-only witness
    val r = spark.sql(
      """SELECT graft_bitmap_andnot_count(
        |  graft_gram_bitmap(array('a','b','c'), 4),
        |  graft_gram_bitmap(array('x','y'), 4)) AS c""".stripMargin)
      .head().getInt(0)
    r should be >= 1
    // identical sets: no witness at all
    spark.sql(
      """SELECT graft_bitmap_andnot_count(
        |  graft_gram_bitmap(array('a','b'), 4),
        |  graft_gram_bitmap(array('b','a'), 4)) AS c""".stripMargin)
      .head().getInt(0) shouldBe 0
    import spark.implicits._
    Seq(Seq(1.0f, 3.0f), Seq(3.0f, 5.0f)).toDF("v")
      .createOrReplaceTempView("vm_in")
    val m = spark.sql(
      "SELECT graft_vector_moments(v) AS m FROM vm_in").head().getStruct(0)
    m.getLong(0) shouldBe 2L
    m.getSeq[Double](1) shouldBe Seq(2.0, 4.0)
    m.getSeq[Double](2) shouldBe Seq(1.0, 1.0, 1.0, 1.0)
  }
}
