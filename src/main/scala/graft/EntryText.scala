package graft

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Bpe, Clusters, CorpusPipeline, Curation, Dedup, Fingerprint, Keyword, LanguageModel, Multimodal, Shingles, Similarity, TextAnalysis}
import graft.lake.ZOrder
import graft.ops.{AsofJoin, Cohorts, Diff, Drift, Funnel, FuzzyJoin, Hierarchy, Ids, IntervalJoin, Normalize, Profile, Resample, RuntimeFilter, Seasonal, SkewJoin, Sketches}
import graft.pipeline.{Cdc, IncrementalAgg, Scd2}
import graft.ops.ColumnOps._
import graft.ops.JsonOps._
import graft.ops.ValidateOps._

/** Text family of the driver contract — query declarations and their
  * DuckDB oracle SQL, split verbatim out of SparkEntry.scala (round 13,
  * pure mechanical move; no behavior change). The self-type pins this
  * trait to the SparkEntry object so every helper reference (rd, model
  * memoizers, shared oracle CTEs) resolves exactly as before the split.
  */
private[graft] trait EntryText { this: SparkEntry.type =>

  private[graft] def queriesText: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ------------------------------------------------- LLM-pipeline: text
    "t1_lang_id" -> ((s, dir) => {
      rd(s, dir, "documents")
        .select(TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang_pred")
    }),


    "t2_quality" -> ((s, dir) => {
      rd(s, dir, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.tokenCountWhitespace(col("text")).as("n_tokens"),
          // floor(x*1e6+0.5)/1e6 not rnd(): Spark rounds via BigDecimal
          // HALF_UP on the decimal expansion, DuckDB via double math — they
          // disagree on ties (e.g. 0.7240624999…); this form is bit-identical
          // in both engines given the same IEEE double input.
          (floor(TextAnalysis.qualityScore(col("text")) * 1e6 + 0.5) / 1e6)
            .as("quality"))
        .orderBy("doc_id")
    }),


    "t3_token_count" -> ((s, dir) => {
      rd(s, dir, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCountWhitespace(col("text")).cast("long"))
            .as("ws_tokens"),
          sum(TextAnalysis.tokenCountBpe(col("text")).cast("long"))
            .as("bpe_tokens"))
        .orderBy("lang")
    }),


    "t4_fingerprint" -> ((s, dir) => {
      rd(s, dir, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),


    "t5_word_ngrams" -> ((s, dir) => {
      rd(s, dir, "documents")
        .select(
          col("doc_id"),
          size(Shingles.wordNGrams(col("text"), 2)).as("n_bigrams"),
          size(Shingles.wordNGrams(col("text"), 3)).as("n_trigrams"))
        .orderBy("doc_id")
    }),


    "t6_corpus_profile" -> ((s, dir) => {
      TextAnalysis.corpusProfile(rd(s, dir, "documents"), "text")
        .orderBy("lang_pred")
    }),


    "t9_repetition" -> ((s, dir) => {
      // duplicate-n-gram boilerplate signal: 1 − distinct/total per doc.
      // The division is one int/int IEEE op — exact cross-engine (the
      // jaccard precedent), no rounding needed.
      rd(s, dir, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.repetitionScore(col("text"), 2).as("rep2"),
          TextAnalysis.repetitionScore(col("text"), 3).as("rep3"))
        .orderBy("doc_id")
    }),


    "t7_clean_text" -> ((s, dir) => {
      // canonical cleanup (NFC + control→space + space-collapse + trim)
      // compared as the FULL cleaned string: both engines must agree on
      // every byte. NFC is identity on this ASCII testdata (the oracle
      // proves strip/collapse/trim parity; TextAnalysisSpec proves NFC on
      // planted combining marks), and the oracle calls nfc_normalize too
      // so a non-ASCII regeneration would keep the comparison honest.
      rd(s, dir, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.cleanText(col("text")).as("clean"))
        .withColumn("n_chars", length(col("clean")))
        .orderBy("doc_id")
    }),


    "t8_pii_scrub" -> ((s, dir) => {
      // testdata carries no PII, so the query PLANTS deterministic
      // doc_id-derived PII into every document on BOTH engines — the
      // masked output and per-class counts then exercise the full regex
      // surface cross-engine (patterns restricted to Java∩RE2 syntax).
      val dirty = concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com ssn 123-45-6789 phone 555-123-4567" +
          " host 10.0.0."),
        (pmod(col("doc_id"), lit(200)) + 1).cast("string"), lit(" end"))
      rd(s, dir, "documents")
        .select(col("doc_id"), dirty.as("_dirty"))
        .select(
          col("doc_id"),
          TextAnalysis.scrubPii(col("_dirty")).as("clean"),
          TextAnalysis.piiCounts(col("_dirty")).as("_pii"))
        .select(
          col("doc_id"), col("clean"),
          col("_pii.n_emails").as("n_emails"),
          col("_pii.n_ssns").as("n_ssns"),
          col("_pii.n_phones").as("n_phones"),
          col("_pii.n_ips").as("n_ips"))
        .orderBy("doc_id")
    }),


    "t17_gopher_repetition" -> ((s, dir) => {
      // Gopher-style repetition filters (Rae et al. 2021 quality rules):
      // duplicate-LINE fraction, duplicate-line CHAR mass, and the char
      // share of the most frequent word 2-gram — the boilerplate signals
      // word-n-gram repetition (t9) dilutes. documents.text ships
      // single-line, so lines are synthesized exactly as t14/q83 do (a
      // newline before common stopwords); the oracle applies the
      // identical rewrite and re-derives all three fractions. Divisions
      // are int/int IEEE ops — exact cross-engine, no rounding.
      TextAnalysis.gopherRepetitionSignals(
        rd(s, dir, "documents").select(col("doc_id"),
          regexp_replace(col("text"), " (the|a|and|of|to|in) ", "\n$1 ")
            .as("text")),
        "doc_id", "text")
        .orderBy("doc_id")
    }),


    "t18_gopher_battery" -> ((s, dir) => {
      // the full Gopher quality battery (ext.TextAnalysis
      // .gopherQualitySignals, Rae et al. 2021 §A1.1): word count, mean
      // word length, symbol-to-word ratio, bullet/ellipsis line
      // fractions, alphabetic-word fraction, distinct-stopword hits, and
      // the combined pass verdict. Lines synthesized exactly as t17; the
      // oracle re-derives every signal — all divisions are int/int IEEE
      // ops, so even the boolean verdict compares exactly.
      TextAnalysis.gopherQualitySignals(
        rd(s, dir, "documents").select(col("doc_id"),
          regexp_replace(col("text"), " (the|a|and|of|to|in) ", "\n$1 ")
            .as("text")),
        "doc_id", "text")
        .orderBy("doc_id")
    }),


    "t19_ccnet_buckets" -> ((s, dir) => {
      // CCNet per-language quality tiers (ext.LanguageModel
      // .perplexityBuckets, Wenzek et al., LREC 2020): t15's self-trained
      // trigram LM scores every document, then ntile(3) over
      // (1e-4-grid avg_nll, doc_id) WITHIN each language labels
      // head/middle/tail — the published head-keep/tail-drop cut. The
      // corpus text never shuffles (broadcast model projection); only
      // the narrow scored frame ranks. The oracle replays model
      // training, scoring, and the tie-broken ntile in SQL.
      val docs = rd(s, dir, "documents")
      val model = LanguageModel.train(docs, col("text"), n = 3)
      LanguageModel.perplexityBuckets(docs, "doc_id", col("text"),
        "lang", model, n = 3, addK = 0.5, alphabetSize = 64)
        .orderBy("doc_id")
    }),


    "t20_blocklist" -> ((s, dir) => {
      // C4 bad-words rule (ext.TextAnalysis.blocklistSignals — Raffel
      // et al. 2020 §2.2: any page containing a banned word is dropped;
      // exact-token match, not substring, so no scunthorpe false
      // positives). One row-local codegen'd projection: the blocklist
      // rides the StopwordHits expression as a reference object, the
      // corpus never shuffles. 'dup' hits ~5% of this corpus; the two
      // absent words prove the zero-hit path. The oracle recounts
      // occurrences with the same tokenization.
      TextAnalysis.blocklistSignals(rd(s, dir, "documents"),
        "doc_id", "text", Seq("dup", "casino", "lottery"))
        .orderBy("doc_id")
    }),


    "t10_bpe_chars" -> ((s, dir) =>
      // the BPE machinery with zero merges: every non-whitespace code
      // point is its own token, so DuckDB can compute the exact count —
      // proving the tokenizer's word boundaries, code-point splitting,
      // and counting before t11 layers merges on top
      rd(s, dir, "documents")
        .select(
          col("doc_id"),
          Bpe.charModel.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("doc_id")),


    "t11_bpe_roundtrip" -> ((s, dir) => {
      // end-to-end trained-BPE invariants, corpus-wide: training is the
      // distributed word-count pass + driver merge loop; the checks are
      // (a) every doc's tokens concatenate back to its whitespace-stripped
      // text (merges never cross word boundaries), (b) the exact corpus
      // code-point total (DuckDB recomputes it), (c) 200 merges actually
      // compress (sum tokens strictly below sum chars)
      val docs = rd(s, dir, "documents").filter(col("text").isNotNull)
      val m = Bpe.train(docs, "text", numMerges = 200)
      docs
        .select(
          m.encode(col("text")).as("toks"),
          regexp_replace(col("text"), "\\s+", "").as("squashed"))
        .select(
          size(col("toks")).cast("long").as("n_tokens"),
          length(col("squashed")).cast("long").as("n_chars"),
          (concat_ws("", col("toks")) === col("squashed"))
            .cast("long").as("rt_ok"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("rt_ok")).as("n_roundtrip"),
          sum(col("n_chars")).as("sum_chars"),
          (sum(col("n_tokens")) < sum(col("n_chars")))
            .cast("int").as("compressed"))
    }),


    "t21_unigram_roundtrip" -> ((s, dir) => {
      // end-to-end trained unigram-LM tokenizer invariants (ext.Unigram
      // — Kudo 2018, the SentencePiece algorithm; the shrink-from-seed
      // counterpart of t11's grow-by-merge BPE): training is the same
      // distributed word-count pass + driver EM/prune loop; encoding is
      // the native Viterbi expression. Checks mirror t11: (a) every
      // doc's pieces concatenate back to its whitespace-stripped text
      // (single-code-point unk fallback makes coverage total), (b) the
      // exact corpus code-point total (DuckDB recomputes it), (c) the
      // trained vocabulary actually compresses.
      val docs = rd(s, dir, "documents").filter(col("text").isNotNull)
      val m = ext.Unigram.train(docs, "text", vocabSize = 512)
      docs
        .select(
          m.encode(col("text")).as("toks"),
          regexp_replace(col("text"), "\\s+", "").as("squashed"))
        .select(
          size(col("toks")).cast("long").as("n_tokens"),
          length(col("squashed")).cast("long").as("n_chars"),
          (concat_ws("", col("toks")) === col("squashed"))
            .cast("long").as("rt_ok"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("rt_ok")).as("n_roundtrip"),
          sum(col("n_chars")).as("sum_chars"),
          (sum(col("n_tokens")) < sum(col("n_chars")))
            .cast("int").as("compressed"))
    }),


    "t12_html_strip" -> ((s, dir) => {
      // HTML -> text extraction (ext.TextAnalysis.stripHtml): documents
      // wrapped in deterministic markup (script/style/comment blocks,
      // attributes, entities), stripped by the cross-engine regex chain.
      // The oracle replays the identical chain in DuckDB with 'g' flags.
      rd(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.stripHtml(concat(
          lit("<html><head><title>D</title><style>p{c:red}</style>" +
            "<script>var a=\"<p>no</p>\";</script></head>" +
            "<body><!-- x --><p class=\"t\">"),
          col("text"),
          lit("</p>&amp; &lt;tail&gt;<br/></body></html>"))).as("clean"))
        .orderBy("doc_id")
    }),


    "t13_url_canonical" -> ((s, dir) => {
      // canonical URL keys (ext.TextAnalysis.canonicalizeUrl): scheme +
      // host lowercased, default port stripped, fragment dropped,
      // tracking params removed, survivors sorted — the oracle derives
      // the expected canonical form independently instead of replaying
      // the regex chain.
      rd(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.canonicalizeUrl(concat(
          lit("HTTPS://WWW.Example.COM:443/"), col("source"),
          lit("/Doc/"), col("doc_id").cast("string"),
          lit("/?utm_source=feed&z=2&ref=x&a=1#sec"))).as("url"))
        .orderBy("doc_id")
    }),


    "t14_line_clean" -> ((s, dir) => {
      // C4-style row-local line cleaning (ext.TextAnalysis.cleanLines):
      // word floor + order-preserving within-doc dedup over synthesized
      // line breaks (the docs have no newlines; breaks before common
      // function words are deterministic on both engines). The punct
      // rule is off — this corpus legitimately has none.
      rd(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.cleanLines(
          regexp_replace(col("text"),
            " (the|a|and|of|to|in) ", "\n$1 "),
          minWords = 5, requireTerminalPunct = false).as("r"))
        .select(col("doc_id"), col("r.clean").as("clean"),
          col("r.n_kept").as("n_kept"),
          col("r.n_dropped").as("n_dropped"))
        .orderBy("doc_id")
    }),


    "t15_lm_perplexity" -> ((s, dir) => {
      // char-trigram LM perplexity scoring (ext.LanguageModel): the CCNet
      // quality-filter pattern, self-trained here so the oracle can
      // re-derive the whole model in SQL. Model + contexts broadcast;
      // the corpus never shuffles at full width.
      val docs = rd(s, dir, "documents")
      val model = LanguageModel.train(docs, col("text"), n = 3)
      LanguageModel.score(docs, Seq("doc_id"), col("text"), model,
        n = 3, addK = 0.5, alphabetSize = 64)
        .select(col("doc_id"), col("n_grams"),
          rnd(col("avg_nll"), 4).as("avg_nll"))
        .orderBy("doc_id")
    }),


    "t16_quality_classifier" -> ((s, dir) => {
      // trained quality filter (ext.QualityClassifier): positives = real
      // documents, negatives = deterministic keyword-stuff corruptions
      // (first word repeated); train on doc_id%5!=0, evaluate held-out
      // doc_id%5==0. The learned model can't be re-derived in SQL, so the
      // declared check is the recall-companion pattern: the oracle knows
      // the eval-set size and expects the accuracy flag to hold.
      val docs = rd(s, dir, "documents")
      val pos = docs.select(col("doc_id"), col("text"), lit(1).as("label"))
      val neg = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(15)),
          _ => element_at(split(trim(col("text")), "\\s+"), 1))).as("text"),
        lit(0).as("label"))
      val all = pos.unionByName(neg)
      val m = ext.QualityClassifier.train(
        all.filter(col("doc_id") % 5 =!= 0), col("text"), col("label"),
        dims = 2048, epochs = 20)
      ext.QualityClassifier.score(
        all.filter(col("doc_id") % 5 === 0), col("text"), m)
        .agg(
          count(lit(1)).as("n_eval"),
          (avg(((col("quality_prob") >= 0.5).cast("int") === col("label"))
            .cast("int")) >= 0.9).cast("int").as("acc_ok"))
    })
  )

  private[graft] def oraclesText: Map[String, String] = Map(

    "t1_lang_id" ->
      """WITH s AS (SELECT
        |    len(list_intersect(ts, ['the','a','of','and','to','in','is','on','for','with']))::DOUBLE / greatest(len(ts), 1) AS s_en,
        |    len(list_intersect(ts, ['el','la','de','y','que','en','un','es','por','con']))::DOUBLE / greatest(len(ts), 1) AS s_es,
        |    len(list_intersect(ts, ['der','die','das','und','ist','von','mit','den','im','ein']))::DOUBLE / greatest(len(ts), 1) AS s_de,
        |    len(list_intersect(ts, ['le','la','de','et','les','des','une','du','est','dans']))::DOUBLE / greatest(len(ts), 1) AS s_fr
        |  FROM (SELECT list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ts
        |        FROM documents))
        |SELECT lang_pred, count(*) AS n_docs FROM (
        |  SELECT CASE WHEN greatest(s_en, s_es, s_de, s_fr) < 0.05 THEN 'und'
        |    WHEN s_fr > greatest(s_en, s_es, s_de) THEN 'fr'
        |    WHEN s_de > greatest(s_en, s_es) THEN 'de'
        |    WHEN s_es > s_en THEN 'es'
        |    ELSE 'en' END AS lang_pred
        |  FROM s) t
        |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,


    "t2_quality" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
        |  floor((
        |    least(len(regexp_split_to_array(trim(text), '\s+'))::DOUBLE / 50.0, 1.0) * 0.4
        |    + (len(list_distinct(regexp_split_to_array(trim(text), '\s+')))::DOUBLE
        |       / len(regexp_split_to_array(trim(text), '\s+'))) * 0.3
        |    + least((length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
        |       / len(regexp_split_to_array(trim(text), '\s+'))) / 8.0, 1.0) * 0.2
        |    + (1.0 - length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))::DOUBLE
        |       / length(text)) * 0.1) * 1e6 + 0.5) / 1e6 AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,


    "t3_token_count" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |    AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,


    "t4_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,


    "t5_word_ngrams" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS a
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN len(a) >= 2 THEN len(list_distinct(
        |    list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])))
        |    ELSE 0 END AS INT) AS n_bigrams,
        |  CAST(CASE WHEN len(a) >= 3 THEN len(list_distinct(
        |    list_transform(range(1, len(a) - 1),
        |      i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])))
        |    ELSE 0 END AS INT) AS n_trigrams
        |FROM d ORDER BY doc_id""".stripMargin,


    "t6_corpus_profile" ->
      """WITH q AS (SELECT
        |    CASE WHEN greatest(s_en, s_es, s_de, s_fr) < 0.05 THEN 'und'
        |      WHEN s_fr > greatest(s_en, s_es, s_de) THEN 'fr'
        |      WHEN s_de > greatest(s_en, s_es) THEN 'de'
        |      WHEN s_es > s_en THEN 'es'
        |      ELSE 'en' END AS lang_pred,
        |    n_tokens, quality
        |  FROM (SELECT
        |    len(list_intersect(ts, ['the','a','of','and','to','in','is','on','for','with']))::DOUBLE / greatest(len(ts), 1) AS s_en,
        |    len(list_intersect(ts, ['el','la','de','y','que','en','un','es','por','con']))::DOUBLE / greatest(len(ts), 1) AS s_es,
        |    len(list_intersect(ts, ['der','die','das','und','ist','von','mit','den','im','ein']))::DOUBLE / greatest(len(ts), 1) AS s_de,
        |    len(list_intersect(ts, ['le','la','de','et','les','des','une','du','est','dans']))::DOUBLE / greatest(len(ts), 1) AS s_fr,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |    least(len(regexp_split_to_array(trim(text), '\s+'))::DOUBLE / 50.0, 1.0) * 0.4
        |      + (len(list_distinct(regexp_split_to_array(trim(text), '\s+')))::DOUBLE
        |         / len(regexp_split_to_array(trim(text), '\s+'))) * 0.3
        |      + least((length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
        |         / len(regexp_split_to_array(trim(text), '\s+'))) / 8.0, 1.0) * 0.2
        |      + (1.0 - length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))::DOUBLE
        |         / length(text)) * 0.1 AS quality
        |  FROM (SELECT text,
        |      list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ts
        |    FROM documents) t0) t1)
        |SELECT lang_pred, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  floor(avg(quality) * 1e4 + 0.5) / 1e4 AS avg_quality
        |FROM q GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,


    "t7_clean_text" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g')) AS clean,
        |  CAST(length(trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g'))) AS INT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,


    "t9_repetition" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS a
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    CASE WHEN len(a) >= 2 THEN
        |      list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])
        |      ELSE [] END AS g2,
        |    CASE WHEN len(a) >= 3 THEN
        |      list_transform(range(1, len(a) - 1),
        |        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])
        |      ELSE [] END AS g3
        |  FROM d)
        |SELECT doc_id,
        |  CASE WHEN len(g2) > 0
        |    THEN 1.0 - len(list_distinct(g2))::DOUBLE / len(g2)
        |    ELSE 0.0 END AS rep2,
        |  CASE WHEN len(g3) > 0
        |    THEN 1.0 - len(list_distinct(g3))::DOUBLE / len(g3)
        |    ELSE 0.0 END AS rep3
        |FROM g ORDER BY doc_id""".stripMargin,


    "t8_pii_scrub" ->
      """WITH d AS (SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com ssn 123-45-6789 phone 555-123-4567 host 10.0.0.'
        |      || CAST(doc_id % 200 + 1 AS VARCHAR) || ' end' AS dirty
        |  FROM documents),
        |s1 AS (SELECT doc_id, dirty, regexp_replace(dirty,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS a1
        |  FROM d),
        |s2 AS (SELECT *, regexp_replace(a1,
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g') AS a2 FROM s1),
        |s3 AS (SELECT *, regexp_replace(a2,
        |    '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g') AS a3 FROM s2)
        |SELECT doc_id,
        |  regexp_replace(a3,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS clean,
        |  CAST(len(regexp_extract_all(dirty,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(a1,
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssns,
        |  CAST(len(regexp_extract_all(a2,
        |    '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(a3,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips
        |FROM s3 ORDER BY doc_id""".stripMargin,


    // t19: t15's model/scoring CTEs + the language join + the tie-broken
    // ntile — head/middle/tail per language, engine-exact
    "t19_ccnet_buckets" ->
      """WITH g AS (SELECT doc_id, substr(text, i, 3) AS gram
        |  FROM documents,
        |    unnest(generate_series(1, length(text) - 2)) AS t(i)),
        |cnt AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
        |ctx AS (SELECT substr(gram, 1, 2) AS pre, sum(c) AS cc
        |  FROM cnt GROUP BY pre),
        |s AS (SELECT doc_id, count(*) AS n_grams,
        |    floor(avg(-ln((c + 0.5) / (cc + 0.5 * 64))) * 1e4 + 0.5) / 1e4
        |      AS avg_nll
        |  FROM g JOIN cnt USING (gram)
        |    JOIN ctx ON substr(gram, 1, 2) = ctx.pre
        |  GROUP BY doc_id),
        |sl AS (SELECT s.doc_id, d.lang, s.n_grams, s.avg_nll,
        |    CAST(ntile(3) OVER (PARTITION BY d.lang
        |      ORDER BY s.avg_nll, s.doc_id) AS INT) AS bucket
        |  FROM s JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, n_grams, avg_nll, bucket,
        |  CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |    ELSE 'tail' END AS tier
        |FROM sl ORDER BY doc_id""".stripMargin,


    "t20_blocklist" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(
        |    regexp_split_to_array(trim(lower(text)), '\s+'),
        |    w -> w IN ('dup', 'casino', 'lottery'))) AS BIGINT)
        |    AS blocked_hits,
        |  len(list_filter(
        |    regexp_split_to_array(trim(lower(text)), '\s+'),
        |    w -> w IN ('dup', 'casino', 'lottery'))) > 0 AS blocked
        |FROM documents ORDER BY doc_id""".stripMargin,


    "t10_bpe_chars" ->
      """SELECT doc_id,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
        |    AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,


    // t21: same contract as t11 — the roundtrip/compression flags are
    // Spark-proven invariants, the oracle independently recomputes the
    // doc count and exact corpus code-point total and pins the flags
    "t21_unigram_roundtrip" ->
      """SELECT count(*) AS n_docs, count(*) AS n_roundtrip,
        |  CAST(sum(length(regexp_replace(text, '\s+', '', 'g'))) AS BIGINT)
        |    AS sum_chars,
        |  1 AS compressed
        |FROM documents WHERE text IS NOT NULL""".stripMargin,


    // the roundtrip/compression flags are Spark-proven invariants; the
    // oracle independently recomputes the doc count and the exact corpus
    // code-point total, and pins the flags' expected values
    "t11_bpe_roundtrip" ->
      """SELECT count(*) AS n_docs, count(*) AS n_roundtrip,
        |  CAST(sum(length(regexp_replace(text, '\s+', '', 'g'))) AS BIGINT)
        |    AS sum_chars,
        |  1 AS compressed
        |FROM documents WHERE text IS NOT NULL""".stripMargin,


    "t12_html_strip" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><head><title>D</title><style>p{c:red}</style>' ||
        |    '<script>var a="<p>no</p>";</script></head>' ||
        |    '<body><!-- x --><p class="t">' || text ||
        |    '</p>&amp; &lt;tail&gt;<br/></body></html>' AS t
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(t,
        |    '(?is)<script\b.*?</script>', ' ', 'g') AS t FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t,
        |    '(?is)<style\b.*?</style>', ' ', 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t,
        |    '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
        |s4 AS (SELECT doc_id, regexp_replace(t,
        |    '<[^>]+>', ' ', 'g') AS t FROM s3),
        |e1 AS (SELECT doc_id, regexp_replace(t, '&lt;', '<', 'g') AS t
        |  FROM s4),
        |e2 AS (SELECT doc_id, regexp_replace(t, '&gt;', '>', 'g') AS t
        |  FROM e1),
        |e3 AS (SELECT doc_id, regexp_replace(t, '&quot;', '"', 'g') AS t
        |  FROM e2),
        |e4 AS (SELECT doc_id, regexp_replace(t, '&#39;', '''', 'g') AS t
        |  FROM e3),
        |e5 AS (SELECT doc_id, regexp_replace(t, '&nbsp;', ' ', 'g') AS t
        |  FROM e4),
        |e6 AS (SELECT doc_id, regexp_replace(t, '&amp;', '&', 'g') AS t
        |  FROM e5)
        |SELECT doc_id, trim(regexp_replace(t, '[ \t\n\f\r]+', ' ', 'g'))
        |  AS clean
        |FROM e6 ORDER BY doc_id""".stripMargin,


    "t13_url_canonical" ->
      """SELECT doc_id,
        |  'https://www.example.com/' || source || '/Doc/' ||
        |  CAST(doc_id AS VARCHAR) || '?a=1&z=2' AS url
        |FROM documents ORDER BY doc_id""".stripMargin,


    "t17_gopher_repetition" ->
      """WITH s AS (SELECT doc_id, regexp_replace(text,
        |    ' (the|a|and|of|to|in) ', chr(10) || '\1 ', 'g') AS t
        |  FROM documents),
        |l0 AS (SELECT doc_id, trim(x) AS line
        |  FROM s, unnest(str_split(t, chr(10))) AS u(x)),
        |lg AS (SELECT doc_id, line, count(*) AS cnt, length(line) AS len
        |  FROM l0 WHERE line <> '' GROUP BY doc_id, line),
        |ls AS (SELECT doc_id,
        |    1.0 - count(*)::DOUBLE / sum(cnt) AS dup_line_frac,
        |    sum((cnt - 1) * len)::DOUBLE / sum(cnt * len)
        |      AS dup_line_char_frac
        |  FROM lg GROUP BY doc_id),
        |w AS (SELECT doc_id, length(trim(t)) AS tchars,
        |    regexp_split_to_array(trim(t), '\s+') AS a FROM s),
        |b AS (SELECT doc_id, tchars, a[i] || ' ' || a[i+1] AS gram
        |  FROM w, unnest(generate_series(1, len(a) - 1)) AS g(i)
        |  WHERE len(a) >= 2),
        |bc AS (SELECT doc_id, tchars, gram, count(*) AS cnt
        |  FROM b GROUP BY doc_id, tchars, gram),
        |bt AS (SELECT doc_id,
        |    (cnt * length(gram))::DOUBLE / tchars AS top_bigram_char_frac
        |  FROM (SELECT bc.*, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY cnt DESC, gram DESC) AS rk FROM bc)
        |  WHERE rk = 1)
        |SELECT s.doc_id,
        |  coalesce(ls.dup_line_frac, 0.0) AS dup_line_frac,
        |  coalesce(ls.dup_line_char_frac, 0.0) AS dup_line_char_frac,
        |  coalesce(bt.top_bigram_char_frac, 0.0) AS top_bigram_char_frac
        |FROM s LEFT JOIN ls USING (doc_id) LEFT JOIN bt USING (doc_id)
        |ORDER BY doc_id""".stripMargin,


    "t18_gopher_battery" ->
      """WITH s AS (SELECT doc_id, regexp_replace(text,
        |    ' (the|a|and|of|to|in) ', chr(10) || '\1 ', 'g') AS t
        |  FROM documents),
        |w AS (SELECT doc_id, x AS w FROM s,
        |    unnest(regexp_split_to_array(trim(t), '\s+')) AS u(x)
        |  WHERE x <> ''),
        |ws AS (SELECT doc_id, count(*) AS n_words,
        |    CAST(sum(length(w)) AS BIGINT) AS wchars,
        |    CAST(sum(CASE WHEN regexp_matches(w, '[A-Za-z]')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS alpha_words,
        |    count(DISTINCT CASE WHEN lower(w) IN ('the','be','to','of',
        |      'and','that','have','with') THEN lower(w) END) AS stop_hits
        |  FROM w GROUP BY doc_id),
        |l AS (SELECT doc_id, trim(x) AS line FROM s,
        |    unnest(str_split(t, chr(10))) AS u(x)),
        |ls AS (SELECT doc_id, count(*) AS n_lines,
        |    CAST(sum(CASE WHEN regexp_matches(line, '^[-*•]')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS bullets,
        |    CAST(sum(CASE WHEN line LIKE '%...' OR line LIKE '%…'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ellipses
        |  FROM l WHERE line <> '' GROUP BY doc_id),
        |sy AS (SELECT doc_id,
        |    (length(t) - length(replace(t, '#', '')))
        |    + (length(t) - length(replace(t, '…', '')))
        |    + (length(t) - length(replace(t, '...', ''))) // 3 AS syms
        |  FROM s),
        |j AS (SELECT s.doc_id,
        |    CAST(coalesce(ws.n_words, 0) AS BIGINT) AS n_words,
        |    coalesce(ws.wchars::DOUBLE / ws.n_words, 0.0)
        |      AS mean_word_len,
        |    coalesce(sy.syms::DOUBLE / ws.n_words, 0.0)
        |      AS symbol_word_ratio,
        |    coalesce(ls.bullets::DOUBLE / ls.n_lines, 0.0)
        |      AS bullet_line_frac,
        |    coalesce(ls.ellipses::DOUBLE / ls.n_lines, 0.0)
        |      AS ellipsis_line_frac,
        |    coalesce(ws.alpha_words::DOUBLE / ws.n_words, 0.0)
        |      AS alpha_word_frac,
        |    CAST(coalesce(ws.stop_hits, 0) AS BIGINT) AS stopword_hits
        |  FROM s LEFT JOIN ws USING (doc_id) LEFT JOIN ls USING (doc_id)
        |    JOIN sy ON s.doc_id = sy.doc_id)
        |SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
        |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
        |  stopword_hits,
        |  (n_words >= 50 AND n_words <= 100000
        |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |   AND symbol_word_ratio < 0.1 AND bullet_line_frac < 0.9
        |   AND ellipsis_line_frac < 0.3 AND alpha_word_frac > 0.8
        |   AND stopword_hits >= 2) AS gopher_pass
        |FROM j ORDER BY doc_id""".stripMargin,


    "t14_line_clean" ->
      """WITH s AS (SELECT doc_id, regexp_replace(text,
        |    ' (the|a|and|of|to|in) ', chr(10) || '\1 ', 'g') AS t
        |  FROM documents),
        |a AS (SELECT doc_id, str_split(t, chr(10)) AS ls FROM s),
        |k AS (SELECT doc_id, ls, list_filter(ls, l ->
        |    len(regexp_split_to_array(trim(l), '\s+')) >= 5) AS k0
        |  FROM a),
        |d AS (SELECT doc_id, ls, list_filter(k0, (x, i) ->
        |    NOT list_contains(k0[1:i-1], x)) AS kd FROM k)
        |SELECT doc_id,
        |  coalesce(array_to_string(kd, chr(10)), '') AS clean,
        |  CAST(len(kd) AS INT) AS n_kept,
        |  CAST(len(ls) - len(kd) AS INT) AS n_dropped
        |FROM d ORDER BY doc_id""".stripMargin,


    "t15_lm_perplexity" ->
      """WITH g AS (SELECT doc_id, substr(text, i, 3) AS gram
        |  FROM documents,
        |    unnest(generate_series(1, length(text) - 2)) AS t(i)),
        |cnt AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
        |ctx AS (SELECT substr(gram, 1, 2) AS pre, sum(c) AS cc
        |  FROM cnt GROUP BY pre)
        |SELECT doc_id, count(*) AS n_grams,
        |  floor(avg(-ln((c + 0.5) / (cc + 0.5 * 64))) * 1e4 + 0.5) / 1e4
        |    AS avg_nll
        |FROM g JOIN cnt USING (gram)
        |  JOIN ctx ON substr(gram, 1, 2) = ctx.pre
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "t16_quality_classifier" ->
      """SELECT CAST(2 * count(*) AS BIGINT) AS n_eval, 1 AS acc_ok
        |FROM documents WHERE doc_id % 5 = 0""".stripMargin
  )
}
