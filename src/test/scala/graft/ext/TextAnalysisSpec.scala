package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("token counts: whitespace vs BPE-ish split") {
    import spark.implicits._
    val d = Seq("Hello world, it's 2024!").toDF("t")
    val ws = d.select(TextAnalysis.tokenCountWhitespace(col("t"))).as[Int].head()
    val bpe = d.select(TextAnalysis.tokenCountBpe(col("t"))).as[Int].head()
    assert(ws === 4)
    // Hello | world | , | it | ' | s | 2024 | !
    assert(bpe === 8)
  }

  test("cleanText: NFC composition, control strip, collapse, trim") {
    import spark.implicits._
    val decomposed = "cafe\u0301 menu" // e + COMBINING ACUTE ACCENT
    val composed = "caf\u00e9 menu"    // precomposed LATIN SMALL E ACUTE
    val messy = "  a\tb\r\ncd   e  "
    val rows = Seq(decomposed, messy, null.asInstanceOf[String])
      .toDF("t")
      .select(TextAnalysis.cleanText(col("t")).as("c"))
      .as[String].collect()
    assert(rows(0) === composed)           // NFC composes the accent
    assert(rows(1) === "a b cd e")         // tab/CR/LF -> single spaces
    assert(rows(2) === null)               // null-safe
    // idempotent: cleaning cleaned text is a no-op
    val twice = Seq(decomposed).toDF("t")
      .select(TextAnalysis.cleanText(TextAnalysis.cleanText(col("t"))))
      .as[String].head()
    assert(twice === composed)
  }

  test("graft_nfc is callable from SQL and matches the Scala path") {
    import spark.implicits._
    graft.GraftExtensions.install(spark)
    // i + COMBINING DIAERESIS composes to \u00ef
    Seq("nai\u0308ve test").toDF("t").createOrReplaceTempView("t7nfc")
    val viaSql = spark.sql("SELECT graft_nfc(t) FROM t7nfc").as[String].head()
    assert(viaSql === "na\u00efve test")
  }

  test("scrubPii masks typed spans; counts attribute each span once") {
    import spark.implicits._
    val d = Seq(
      "mail a.user+tag@sub.example.org now",
      "ssn 123-45-6789 then phone 555-123-4567 at 192.168.0.1",
      "no pii here at all",
      "dots 1.2.3.4 and 10.20.30.40").toDF("t")
      .select(
        TextAnalysis.scrubPii(col("t")).as("c"),
        TextAnalysis.piiCounts(col("t")).as("p"))
      .select(col("c"), col("p.n_emails"), col("p.n_ssns"),
        col("p.n_phones"), col("p.n_ips"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(d(0) === (("mail <EMAIL> now", 1L, 0L, 0L, 0L)))
    // the SSN is consumed before the phone pattern could claim its tail
    assert(d(1) === (("ssn <SSN> then phone <PHONE> at <IP>", 0L, 1L, 1L, 1L)))
    assert(d(2) === (("no pii here at all", 0L, 0L, 0L, 0L)))
    assert(d(3) === (("dots <IP> and <IP>", 0L, 0L, 0L, 2L)))
  }

  test("repetitionScore: duplicate-ngram fraction, 0 for short docs") {
    import spark.implicits._
    val r = Seq(
      "a b a b a",            // bigrams: ab,ba,ab,ba -> 2/4 duplicated
      "all distinct words here",
      "one").toDF("t")
      .select(TextAnalysis.repetitionScore(col("t"), 2).as("s"))
      .as[Double].collect()
    assert(r(0) === 0.5)
    assert(r(1) === 0.0)
    assert(r(2) === 0.0) // shorter than n -> defined as 0
  }

  test("language ID picks the right stopword profile") {
    import spark.implicits._
    val d = Seq(
      ("en", "the cat sat on the mat and looked at the dog with a smile"),
      ("es", "el perro y la casa de un amigo es que en la calle"),
      ("de", "der hund und die katze ist von dem haus mit den kindern"),
      ("fr", "le chien et la maison des amis est dans une rue du centre"),
      ("und", "zzz qqq xxx yyy www vvv")).toDF("want", "t")
    val got = d.select(col("want"), TextAnalysis.langId(col("t")))
      .as[(String, String)].collect()
    got.foreach { case (want, pred) => assert(pred === want) }
  }

  test("quality score stays in [0,1] and orders clean text above noise") {
    import spark.implicits._
    val d = Seq(
      ("clean", ("a solid paragraph of reasonably varied english prose " +
        "with plenty of distinct meaningful words forming useful content " +
        "for a language model to learn from today")),
      ("noisy", "$$$ ### !!! @@@ %% ^^ && ** (( ))"),
      ("empty", "")).toDF("k", "t")
    val q = d.select(col("k"), TextAnalysis.qualityScore(col("t")).as("q"))
      .as[(String, Double)].collect().toMap
    q.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(q("clean") > q("noisy"))
  }

  test("fingerprints are whitespace/case-insensitive, content-sensitive") {
    import spark.implicits._
    val d = Seq(
      ("a", "Hello  World"), ("b", "hello world"), ("c", "hello worlds"))
      .toDF("id", "t")
    val fp = d.select(col("id"), TextAnalysis.fingerprint(col("t")).as("f"))
      .as[(String, String)].collect().toMap
    assert(fp("a") === fp("b"))
    assert(fp("a") !== fp("c"))
    val fp64 = d.select(col("id"), TextAnalysis.fingerprint64(col("t")).as("f"))
      .as[(String, Long)].collect().toMap
    assert(fp64("a") === fp64("b"))
    assert(fp64("a") !== fp64("c"))
  }

  test("corpusProfile aggregates per predicted language") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat and the dog sat on a mat in the sun for a while"),
      (2L, "the quick brown fox is in the barn with the hens and a cow"),
      (3L, "el perro y la casa de un amigo es que en la calle hay sol"))
      .toDF("doc_id", "text")
    val prof = TextAnalysis.corpusProfile(d, "text")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(prof("en")._2 === 2L)
    assert(prof("es")._2 === 1L)
    assert(prof("en")._3 > 0L)
  }

  test("stripHtml: blocks vanish, tags strip, entities decode, ws collapses") {
    import spark.implicits._
    val html =
      """<html><head><title>Title</title>
        |<style type="text/css">p { color: red }</style>
        |<script>var x = "<p>not text</p>";</script></head>
        |<body><!-- hidden --><h1 class="big">Head&nbsp;line</h1>
        |<p>A &amp; B &lt;kept&gt; &quot;q&#39;s&quot;</p><br/>
        |tail</body></html>""".stripMargin
    val out = Seq(html).toDF("t")
      .select(TextAnalysis.stripHtml($"t")).head().getString(0)
    out shouldBe "Title Head line A & B <kept> \"q's\" tail"
  }

  test("stripHtml: double-encoded &amp;lt; decodes once, not twice") {
    import spark.implicits._
    Seq("x &amp;lt; y").toDF("t")
      .select(TextAnalysis.stripHtml($"t")).head().getString(0) shouldBe
      "x &lt; y"
  }

  test("stripHtml: plain text passes through unchanged (modulo ws)") {
    import spark.implicits._
    Seq("no  markup   here").toDF("t")
      .select(TextAnalysis.stripHtml($"t")).head().getString(0) shouldBe
      "no markup here"
  }

  test("cleanLines: word floor, punct rule, order-preserving dedup") {
    import spark.implicits._
    val text = Seq(
      "A full sentence with enough words here.", // kept
      "too short.",                              // < minWords
      "no terminal punctuation on this line",    // punct rule drops
      "A full sentence with enough words here.", // repeat -> deduped
      "Another proper closing line stands alone!").mkString("\n")
    val r = Seq(text).toDF("t")
      .select(TextAnalysis.cleanLines($"t", minWords = 4).as("r"))
      .select("r.clean", "r.n_kept", "r.n_dropped").head()
    r.getString(0) shouldBe
      "A full sentence with enough words here.\n" +
      "Another proper closing line stands alone!"
    r.getInt(1) shouldBe 2
    r.getInt(2) shouldBe 3
  }

  test("cleanLines: punct rule off keeps unpunctuated prose") {
    import spark.implicits._
    val r = Seq("plain words made of five tokens\nso is this other line")
      .toDF("t")
      .select(TextAnalysis.cleanLines($"t", minWords = 5,
        requireTerminalPunct = false).as("r"))
      .select("r.n_kept").head()
    r.getInt(0) shouldBe 2
  }

  test("canonicalizeUrl: full normalization, tracking dropped, params sorted") {
    import spark.implicits._
    def canon(u: String): String = Seq(u).toDF("u")
      .select(TextAnalysis.canonicalizeUrl($"u")).head().getString(0)
    canon("HTTPS://WWW.Example.COM:443/Path/Sub/?utm_source=x&z=2" +
      "&ref=abc&a=1#frag") shouldBe
      "https://www.example.com/Path/Sub?a=1&z=2"
    // http default port, no query, trailing slashes, case-preserved path
    canon("HTTP://Host.com:80/A/B///") shouldBe "http://host.com/A/B"
    // only tracking params -> no query at all
    canon("https://h.co/p?utm_a=1&gclid=2&fbclid=3") shouldBe
      "https://h.co/p"
    // non-default port survives; param order collides to one form
    canon("https://h.co:8443/p?b=2&a=1") shouldBe
      canon("https://h.co:8443/p?a=1&b=2")
    // schemeless input passes through trimmed (no canonical form)
    canon("  relative/path?x=1 ") shouldBe "relative/path?x=1"
  }

  test("gopherRepetitionSignals: line dup fractions and top-bigram share by hand") {
    import spark.implicits._
    // doc 1: 4 non-empty lines, "nav bar" twice -> dup_line_frac = 1 - 3/4;
    //   dup chars = 7 of (7+7+10+6=30); top bigram "nav bar" (count 2 of
    //   words "nav bar nav bar first line second half", tchars = len)
    // doc 2: no duplicate lines, every bigram unique
    // doc 3: blank/whitespace-only text -> all zeros
    val docs = Seq(
      (1L, "nav bar\nnav bar\nfirst line\n\n  \nsecond"),
      (2L, "alpha beta gamma"),
      (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis
      .gopherRepetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Double, Double, Double)].collect()

    val d1 = out(0)
    assert(d1._2 === 1.0 - 3.0 / 4.0)
    assert(d1._3 === 7.0 / 30.0)
    // words: nav bar nav bar first line second (newlines are whitespace);
    // top bigram "nav bar" count 2, len 7; tchars = trimmed text length
    val tchars1 = "nav bar\nnav bar\nfirst line\n\n  \nsecond".trim.length
    assert(d1._4 === 2.0 * 7.0 / tchars1)

    val d2 = out(1)
    assert(d2._2 === 0.0 && d2._3 === 0.0)
    // both bigrams have count 1 and length 10; tie breaks by descending
    // gram text -> "beta gamma", share 1*10/16
    assert(d2._4 === 10.0 / 16.0)
    val d3 = out(2)
    assert(d3._2 === 0.0 && d3._3 === 0.0 && d3._4 === 0.0)
  }

  test("gopherQualitySignals: full battery by hand") {
    import spark.implicits._
    // doc 1: clean prose — 8 words of total length 33, two distinct
    //   stopwords (the, of), all alphabetic, no symbols/bullets/ellipses
    // doc 2: degenerate — bullet-led lines, ellipsis line, # symbols,
    //   one stopword, a numeric token
    // doc 3: whitespace-only -> zeros, fails
    val docs = Seq(
      (1L, "the quality of documents matters for training corpora"),
      (2L, "- bullet one...\n- bullet two\n## see 42 the end…"),
      (3L, " \n  ")).toDF("doc_id", "text")
    val out = TextAnalysis
      .gopherQualitySignals(docs, "doc_id", "text",
        TextAnalysis.GopherThresholds(minWords = 5, minStopwords = 2))
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double, Double, Double, Long,
        Boolean)].collect()

    val d1 = out(0)
    assert(d1._2 === 8L)
    assert(d1._3 === ("thequalityofdocumentsmattersfortrainingcorpora"
      .length.toDouble / 8))
    assert(d1._4 === 0.0) // no symbols
    assert(d1._5 === 0.0 && d1._6 === 0.0) // no bullet/ellipsis lines
    assert(d1._7 === 1.0) // all words alphabetic
    assert(d1._8 === 2L) // the, of
    assert(d1._9) // passes the relaxed battery

    val d2 = out(1)
    // words: "- bullet one... - bullet two ## see 42 the end…" -> 11
    assert(d2._2 === 11L)
    // symbols: two '#', one '…', one '...' -> 4 of 11 words
    assert(d2._4 === 4.0 / 11.0)
    // 3 lines, 2 bullet-led ('-' prefix; '##' doesn't count), 2
    // ellipsis-terminated ('one...' line and the '…' line)
    assert(d2._5 === 2.0 / 3.0)
    assert(d2._6 === 2.0 / 3.0)
    // non-alpha words: '-', '-', '##', '42' -> 7/11 alphabetic
    assert(d2._7 === 7.0 / 11.0)
    assert(d2._8 === 1L) // only 'the'
    assert(!d2._9) // symbol ratio, bullets, ellipses, alpha all fail

    val d3 = out(2)
    assert(d3._2 === 0L && d3._3 === 0.0 && d3._8 === 0L && !d3._9)
  }

  test("blocklist: exact-token occurrences, case-insensitive, no " +
      "substring false positives; filter drops exactly the hit docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text about ducks"),
      (2L, "SPAM spam and more Spam"),      // 3 occurrences, mixed case
      (3L, "spammy antispam spams"),        // substrings must NOT hit
      (4L, null.asInstanceOf[String]),
      (5L, "one spam here")).toDF("doc_id", "text")
    val sig = TextAnalysis.blocklistSignals(docs, "doc_id", "text",
        Seq("spam", "casino"))
      .orderBy("doc_id").collect()
    assert(sig.map(r => (r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq ===
      Seq((1L, 0L), (2L, 3L), (3L, 0L), (4L, -1L), (5L, 1L)))
    assert(sig(3).isNullAt(2)) // null text -> null verdict
    val kept = TextAnalysis.blocklistFilter(docs, "doc_id", "text",
        Seq("spam", "casino"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L)) // hits drop; null text fails closed
    // a MIXED-CASE list entry must match identically (the list is
    // lowered to meet the lowered tokens)
    val mixed = TextAnalysis.blocklistSignals(docs, "doc_id", "text",
        Seq("SpAm", "CASINO"))
      .orderBy("doc_id").collect()
      .map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq
    assert(mixed === Seq(0L, 3L, 0L, -1L, 1L))
  }
}
