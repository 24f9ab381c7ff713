package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Shingles._

/** Text-analysis operators for LLM-corpus curation (SURVEY.md §7.5):
  * language ID, quality scoring, token counting, fingerprinting. All pure
  * `functions._` compositions (codegen'd, UDF-free) so a 100 TB sweep is a
  * single scan + projection; the only shuffles are the caller's aggregates.
  */
object TextAnalysis {

  /** "BPE-ish" token pattern: letter runs, digit runs, or single
    * non-space symbols — the pre-tokenization split used by GPT-style BPE
    * vocabularies (letters / numbers / punctuation split apart).
    */
  final val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Canonical text cleanup for crawled corpora, in fixed order:
    * Unicode NFC composition (native expression — composition-form noise
    * would defeat exact fingerprints and skew shingle sets), control
    * characters → space (words stay split where a C0/DEL separated them),
    * space runs collapsed, ends trimmed. After the control strip the only
    * whitespace left IS the space character, so the collapse uses the
    * explicit `' +'` class — exactly reproducible in any regex engine
    * (Java `\s` and RE2 `\s` disagree on `\x0B`, see the q08/x3r notes).
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        graft.functions.NfcFunctions.nfc_normalize(text),
        "[\\x00-\\x1F\\x7F]", " "),
      " +", " "))

  /** HTML → text extraction, the first step of a web-corpus pipeline.
    * Deliberately a pure `regexp_replace` chain over syntax Java regex and
    * RE2 agree on (inline `(?is)` flags, non-greedy `.*?`, explicit
    * classes — same cross-engine contract as the PII patterns), so it
    * stays inside whole-stage codegen AND any SQL oracle can replicate it
    * byte-for-byte. Order is part of the contract: script/style/comment
    * BLOCKS go first (their content must vanish, not just their tags),
    * then all remaining tags, then entity decodes with `&amp;` LAST (the
    * standard order that cannot double-decode `&amp;lt;`), then
    * whitespace collapse. This is the regex tier of extraction — a
    * boilerplate-aware extractor (main-content detection) would sit above
    * it as a scoring pass, but the tag strip itself is exactly this.
    */
  def stripHtml(text: Column): Column = {
    val noScript = regexp_replace(text, "(?is)<script\\b.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) =>
        regexp_replace(c, e, java.util.regex.Matcher.quoteReplacement(r)) }
    // explicit whitespace class, not \s: Java and RE2 disagree on \x0B
    // (see cleanText) and this chain must replay identically in SQL
    trim(regexp_replace(ent, "[ \\t\\n\\f\\r]+", " "))
  }

  /** C4-style row-local line cleaning: split on newlines, keep lines
    * with at least `minWords` whitespace tokens (and, when
    * `requireTerminalPunct`, ending in `.`, `!`, `?` or a closing
    * quote — the C4 rule; disable for text that legitimately lacks
    * punctuation), then drop REPEATED lines keeping the first
    * occurrence — the within-document nav/boilerplate scrub. Returns
    * `struct(clean, n_kept, n_dropped)`.
    *
    * Pure higher-order built-ins, row-local (no shuffle at any corpus
    * size). The order-preserving dedup is an indexed `filter` (element
    * kept iff absent from the preceding slice) because engines disagree
    * on `array_distinct`/`list_distinct` ordering — this form replays
    * identically anywhere.
    */
  def cleanLines(
      text: Column,
      minWords: Int = 3,
      requireTerminalPunct: Boolean = true): Column = {
    val lines = split(text, "\n")
    val rule: Column => Column = l => {
      val words = size(split(trim(l), "\\s+")) >= minWords
      if (requireTerminalPunct)
        words && l.rlike("[.!?\"']\\s*$")
      else words
    }
    val kept = filter(lines, rule)
    val deduped = filter(kept,
      (x, i) => array_position(slice(kept, lit(1), i), x) === 0)
    struct(
      array_join(deduped, "\n").as("clean"),
      size(deduped).as("n_kept"),
      (size(lines) - size(deduped)).as("n_dropped"))
  }

  /** Canonical URL form for web-corpus dedup and crawl-frontier keys:
    * fragment dropped, scheme + host lowercased, default ports stripped
    * (`:80` http / `:443` https), trailing path slashes removed (path
    * CASE is preserved — paths are case-sensitive), tracking parameters
    * dropped (`utm_*`, `gclid`, `fbclid`, `ref`, `mc_cid`, `mc_eid`),
    * surviving query params SORTED so `?b=2&a=1` and `?a=1&b=2` collide.
    * Two URLs that differ only in tracking noise then hash identically —
    * the key [[Dedup.exactDuplicates]] or a crawl frontier dedups on.
    *
    * Pure regexp/array built-ins (codegen'd, no UDF) over syntax Java
    * regex and RE2 agree on, same cross-engine contract as the PII
    * chain. Input without a `scheme://` passes through trimmed —
    * relative URLs have no canonical absolute form.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([^:/?#]+)://", 1))
    val rem = regexp_replace(noFrag, "^[^:/?#]+://", "")
    val hostport = lower(regexp_extract(rem, "^([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val pathq = rem.substr(length(hostport) + 1, lit(1000000))
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(pathq, "^[^?]*\\?(.*)$", 1)
    val kept = filter(split(query, "&"), p =>
      (length(p) > 0) && !p.startsWith("utm_") &&
        !p.rlike("^(gclid|fbclid|ref|mc_cid|mc_eid)="))
    val q = when(size(kept) > 0,
      concat(lit("?"), array_join(array_sort(kept), "&")))
      .otherwise(lit(""))
    when(scheme === "", trim(url))
      .otherwise(concat(scheme, lit("://"), host, path, q))
  }

  /** PII patterns, deliberately restricted to syntax Java regex and RE2
    * agree on (no lookarounds, no backrefs; `\b` and explicit classes
    * only) so a DuckDB/Trino/etc. oracle can reproduce the scrub exactly.
    * Masking order is part of the contract (longest/most-specific first):
    * email → SSN → phone → IPv4 — e.g. an SSN must be consumed before the
    * phone pattern could claim its tail.
    */
  final val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  final val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  final val Ipv4Pattern =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Mask PII spans with typed placeholder tokens (the form most
    * anonymization pipelines feed to training: the MODEL should see that
    * an email stood there, not the address). Pure regexp_replace chain —
    * codegen'd, order fixed per the pattern contract above.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailPattern, "<EMAIL>"),
          SsnPattern, "<SSN>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** Per-document PII hit counts (audit/reporting companion to
    * [[scrubPii]]): struct of match counts per pattern class, counted on
    * the SAME masking order (each count sees the previous classes already
    * masked, so a span is attributed to exactly one class).
    */
  def piiCounts(text: Column): Column = {
    val afterEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val afterSsn = regexp_replace(afterEmail, SsnPattern, "<SSN>")
    val afterPhone = regexp_replace(afterSsn, PhonePattern, "<PHONE>")
    struct(
      regexp_count(text, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(SsnPattern)).cast("long").as("n_ssns"),
      regexp_count(afterSsn, lit(PhonePattern)).cast("long").as("n_phones"),
      regexp_count(afterPhone, lit(Ipv4Pattern)).cast("long").as("n_ips"))
  }

  /** Duplicate word-n-gram fraction — the Gopher/C4-style boilerplate
    * signal: `1 − distinct/total` over the n-gram MULTISET, 0.0 for
    * documents shorter than n tokens. Crawled boilerplate (nav bars,
    * cookie banners, templated listings) repeats phrases; prose doesn't.
    * Pure int arithmetic + one division — the 100 TB sweep is a scan.
    */
  def repetitionScore(text: Column, n: Int = 2): Column = {
    val all = Shingles.wordNGramsAll(text, n)
    val total = size(all)
    when(total > 0,
      lit(1.0) - size(array_distinct(all)).cast("double") / total)
      .otherwise(lit(0.0))
  }

  /** Whitespace token count. */
  def tokenCountWhitespace(text: Column): Column = size(tokens(text))

  /** Regex (BPE-ish) token count. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  // ------------------------------------------------------------- lang id

  /** Tiny function-word profiles. Real systems use char-n-gram models
    * (e.g. CLD3); the n-gram-free heuristic here is the classic
    * stopword-profile scorer — enough to exercise the operator shape and
    * stay SQL-expressible for the oracle.
    */
  final val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une", "du", "est", "dans"))

  /** Fraction of the document's distinct tokens found in `profile`.
    * `stopword_hits` (one generated method call per profile) rather than
    * `array_intersect` with a literal array — see
    * [[graft.functions.StopwordHits]] for why this matters with several
    * profiles in one projection.
    */
  def stopwordScore(text: Column, profile: Seq[String]): Column = {
    val ts = tokenSet(lower(text))
    (graft.functions.StopwordFunctions.stopword_hits(ts, profile).cast("double") /
      greatest(size(ts), lit(1)).cast("double"))
  }

  /** Predicted language: the profile with the highest score, "und" when no
    * profile scores above `minScore`. Deterministic tie-break: profile
    * order (first wins — encoded as a negative-index struct field, since
    * struct ordering compares fields left to right).
    *
    * Shaped as `array_max` over (score, -index, lang) structs rather than a
    * `when`-chain fold: the fold embeds every earlier profile's expression
    * tree in each later branch (exponential tree growth), which made Janino
    * spend seconds COMPILING the generated code per query — argmax keeps
    * the tree linear in the profile count.
    */
  def langId(text: Column, minScore: Double = 0.05): Column = {
    val candidates = StopwordProfiles.zipWithIndex.map {
      case ((lang, words), i) =>
        struct(
          stopwordScore(text, words).as("s"),
          lit(-i).as("ni"),
          lit(lang).as("lang"))
    }
    val best = array_max(array(candidates: _*))
    when(best.getField("s") >= minScore, best.getField("lang"))
      .otherwise(lit("und"))
  }

  // ------------------------------------------------------------- quality

  /** Heuristic quality score in [0, 1]:
    * 0.4·min(tokens/50, 1) + 0.3·(distinct/total tokens)
    * + 0.2·min(avgWordLen/8, 1) + 0.1·(1 − symbolRatio).
    * Length, diversity, word-shape and symbol-noise — the standard cheap
    * pre-filter family for LLM training corpora.
    */
  def qualityScore(text: Column): Column = {
    val total = size(tokens(text)).cast("double")
    val distinctN = size(tokenSet(text)).cast("double")
    val lenScore = least(total / 50.0, lit(1.0))
    val diversity = when(total > 0, distinctN / total).otherwise(lit(0.0))
    val avgLen = when(total > 0,
      length(regexp_replace(text, "\\s+", "")).cast("double") / total)
      .otherwise(lit(0.0))
    val shapeScore = least(avgLen / 8.0, lit(1.0))
    val symbols = length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double")
    val symbolRatio = when(length(text) > 0,
      symbols / length(text).cast("double")).otherwise(lit(0.0))
    lenScore * 0.4 + diversity * 0.3 + shapeScore * 0.2 + (lit(1.0) - symbolRatio) * 0.1
  }

  // --------------------------------------------------------- fingerprint

  /** Content-defined fingerprint: md5 of normalized text (cross-engine
    * reproducible); see [[Dedup.exactFingerprint]].
    */
  def fingerprint(text: Column): Column = Dedup.exactFingerprint(text)

  /** Fast 64-bit rolling fingerprint (xxhash64 of normalized text) for
    * engine-internal dedup keys where hex md5 width is wasteful.
    */
  def fingerprint64(text: Column): Column = xxhash64(normalizeText(text))

  // ------------------------------------------------------------ profiles

  /** One-call corpus profile: per-language counts with quality stats. */
  def corpusProfile(df: DataFrame, textCol: String): DataFrame =
    df.select(
      langId(col(textCol)).as("lang_pred"),
      tokenCountWhitespace(col(textCol)).as("n_tokens"),
      qualityScore(col(textCol)).as("quality"))
      .groupBy("lang_pred")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("total_tokens"),
        // floor form, not round(): cross-engine-stable on decimal ties
        // (see SparkEntry t2_quality note)
        (floor(avg("quality") * 1e4 + 0.5) / 1e4).as("avg_quality"))

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models", table A1 quality filters): per document, the fraction of
    * (trimmed, non-empty) LINES that are duplicate occurrences of another
    * line, the fraction of line CHARACTERS inside those duplicate
    * occurrences, and the fraction of the document's characters covered
    * by its most frequent word 2-gram. Line-level repetition catches the
    * boilerplate that word-n-gram scores ([[repetitionScore]], t9) dilute
    * — nav bars, headers, timestamps repeated down a page — and the
    * top-2-gram share catches degenerate generation/scrape loops.
    *
    * Scale shape: two explode→groupBy chains keyed by `(doc, line)` /
    * `(doc, gram)` plus one per-doc window over the already-grouped gram
    * counts — never a per-row O(n²) array lambda (the t16 lesson: a
    * lambda that re-references a derived array re-evaluates it per
    * ELEMENT under whole-stage codegen, so the explode→groupBy form IS
    * the cheap one here).
    *
    * Output: `(idCol, dup_line_frac, dup_line_char_frac,
    * top_bigram_char_frac)`, zeros for documents with no qualifying
    * lines/grams. Every division is a single int/int IEEE op — exact
    * cross-engine (jaccard precedent). The top-2-gram tie breaks by
    * descending gram text, deterministically.
    */
  def gopherRepetitionSignals(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("_id"), col(textCol).as("_text"))

    val lineGroups = base
      .select(col("_id"), explode(split(col("_text"), "\n")).as("_raw"))
      .select(col("_id"), trim(col("_raw")).as("_line"))
      .filter(col("_line") =!= "")
      .groupBy(col("_id"), col("_line"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_len", length(col("_line")))
    val lineSignals = lineGroups
      .groupBy(col("_id"))
      .agg(
        (lit(1.0) - count(lit(1)).cast("double") / sum(col("_cnt")))
          .as("dup_line_frac"),
        (sum((col("_cnt") - 1) * col("_len")).cast("double") /
          sum(col("_cnt") * col("_len"))).as("dup_line_char_frac"))

    val gramCounts = base
      .select(col("_id"), length(trim(col("_text"))).as("_tchars"),
        explode(wordNGramsAll(col("_text"), 2)).as("_gram"))
      .groupBy(col("_id"), col("_tchars"), col("_gram"))
      .agg(count(lit(1)).as("_cnt"))
    val topGram = gramCounts
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("_id").orderBy(col("_cnt").desc, col("_gram").desc)))
      .filter(col("_rk") === 1)
      .select(col("_id"),
        ((col("_cnt") * length(col("_gram"))).cast("double") /
          col("_tchars")).as("top_bigram_char_frac"))

    base.select(col("_id"))
      .join(lineSignals, Seq("_id"), "left")
      .join(topGram, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac"),
        coalesce(col("dup_line_char_frac"), lit(0.0))
          .as("dup_line_char_frac"),
        coalesce(col("top_bigram_char_frac"), lit(0.0))
          .as("top_bigram_char_frac"))
  }

  /** The Gopher stopword-presence set (Rae et al. 2021 §A1.1): a document
    * must contain at least [[GopherMinStopwords]] DISTINCT members
    * (matched as whole lowercased whitespace tokens) to pass the battery.
    */
  final val GopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  final val GopherMinStopwords = 2

  /** Threshold set for [[gopherQualitySignals]]' `gopher_pass` verdict.
    * Defaults are the published Gopher rules (Rae et al. 2021 §A1.1);
    * callers tune per corpus — a filter battery is only useful when its
    * thresholds match the corpus's actual signal distributions (the
    * driver testdata's word-soup documents run 10-99 words and carry at
    * most one distinct stopword, so the paper's 50-word / 2-stopword
    * floors would reject 100% — the declared q81/q84 use
    * `minWords = 20, minStopwords = 1` instead).
    */
  case class GopherThresholds(
      minWords: Long = 50,
      maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopwords: Int = GopherMinStopwords)

  /** The full Gopher quality-rule battery (Rae et al. 2021 §A1.1), the
    * companion of [[gopherRepetitionSignals]] (t17): per-document word
    * count, mean word length, symbol-to-word ratio (`#`, `…`, `...`),
    * bullet-led and ellipsis-terminated line fractions, alphabetic-word
    * fraction, distinct-stopword hits, and the combined `gopher_pass`
    * verdict against [[GopherThresholds]] (paper defaults: words in
    * [50, 100000], mean length in [3, 10], symbol ratio < 0.1, bullet
    * lines < 0.9, ellipsis lines < 0.3, alpha words > 0.8, stopword
    * hits ≥ 2).
    *
    * Scale shape (the t16 lesson applied at design time, same as t17):
    * one explode→groupBy chain per SHAPE — words and lines each
    * aggregate once keyed by doc — plus a scan-local projection for the
    * symbol counts (pure length arithmetic, no explode). Every fraction
    * is a single int/int IEEE division — exact cross-engine — and the
    * threshold compares run on those exact doubles, so the boolean
    * verdict itself is engine-exact.
    *
    * Output: `(idCol, n_words, mean_word_len, symbol_word_ratio,
    * bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    * stopword_hits, gopher_pass)`; zero-word documents report zeros and
    * fail the battery.
    */
  def gopherQualitySignals(
      df: DataFrame, idCol: String, textCol: String,
      thresholds: GopherThresholds = GopherThresholds()): DataFrame = {
    val th = thresholds
    val base = df.select(col(idCol).as("_id"), col(textCol).as("_text"))

    val wordStats = base
      .select(col("_id"),
        explode(split(trim(col("_text")), "\\s+")).as("_w"))
      .filter(col("_w") =!= "")
      .groupBy(col("_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("_w"))).as("_wchars"),
        sum(when(col("_w").rlike("[A-Za-z]"), 1L).otherwise(0L))
          .as("_alpha_words"),
        countDistinct(when(
          lower(col("_w")).isin(GopherStopwords: _*), lower(col("_w"))))
          .as("stopword_hits"))

    val lineStats = base
      .select(col("_id"), explode(split(col("_text"), "\n")).as("_raw"))
      .select(col("_id"), trim(col("_raw")).as("_line"))
      .filter(col("_line") =!= "")
      .groupBy(col("_id"))
      .agg(
        count(lit(1)).as("_n_lines"),
        sum(when(col("_line").rlike("^[-*•]"), 1L).otherwise(0L))
          .as("_bullets"),
        sum(when(col("_line").endsWith("...") ||
          col("_line").endsWith("…"), 1L).otherwise(0L))
          .as("_ellipses"))

    // symbol occurrences by length arithmetic — `replace` removes
    // non-overlapping matches left-to-right identically in Spark and
    // DuckDB, so the '...'-count division by 3 is exact
    def occurrences(needle: String, width: Int): Column = {
      val diff = length(col("_text")) -
        length(regexp_replace(col("_text"),
          java.util.regex.Pattern.quote(needle), ""))
      (if (width == 1) diff else diff / width).cast("long")
    }
    val symbols = base.select(col("_id"),
      (occurrences("#", 1) + occurrences("…", 1) +
        occurrences("...", 3)).as("_syms"))

    base.select(col("_id"))
      .join(wordStats, Seq("_id"), "left")
      .join(lineStats, Seq("_id"), "left")
      .join(symbols, Seq("_id"))
      .select(
        col("_id").as(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("_wchars").cast("double") / col("n_words"), lit(0.0))
          .as("mean_word_len"),
        coalesce(col("_syms").cast("double") / col("n_words"), lit(0.0))
          .as("symbol_word_ratio"),
        coalesce(col("_bullets").cast("double") / col("_n_lines"),
          lit(0.0)).as("bullet_line_frac"),
        coalesce(col("_ellipses").cast("double") / col("_n_lines"),
          lit(0.0)).as("ellipsis_line_frac"),
        coalesce(col("_alpha_words").cast("double") / col("n_words"),
          lit(0.0)).as("alpha_word_frac"),
        coalesce(col("stopword_hits"), lit(0L)).as("stopword_hits"))
      .withColumn("gopher_pass",
        col("n_words") >= th.minWords && col("n_words") <= th.maxWords &&
          col("mean_word_len") >= th.minMeanWordLen &&
          col("mean_word_len") <= th.maxMeanWordLen &&
          col("symbol_word_ratio") < th.maxSymbolRatio &&
          col("bullet_line_frac") < th.maxBulletFrac &&
          col("ellipsis_line_frac") < th.maxEllipsisFrac &&
          col("alpha_word_frac") > th.minAlphaFrac &&
          col("stopword_hits") >= th.minStopwords)
  }

  /** Word-blocklist signals — the C4 "bad words" rule (Raffel et al.
    * 2020, §2.2: any page containing a word from the banned list is
    * removed; Dolma and RefinedWeb keep the same stage with their own
    * lists). Output per document: `(idCol, blocked_hits, blocked)` —
    * total blocklist-token OCCURRENCES (case-insensitive, whitespace
    * tokenization, exact token match — no substring false positives:
    * the published failure mode of naive contains-matching) and the
    * drop verdict. Null text propagates null signals.
    *
    * 100 TB shape: one row-local codegen'd projection — the blocklist
    * rides the [[graft.functions.StopwordHits]] expression as a
    * reference object (binary search per token), so the corpus never
    * shuffles and nothing broadcasts. URL/domain blocklists compose the
    * same way over [[canonicalizeUrl]]'s host output.
    */
  def blocklistSignals(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      words: Seq[String]): DataFrame = {
    require(words.nonEmpty, "blocklistSignals: empty blocklist")
    // tokens are lowercased, so the list must be too — a mixed-case
    // entry would otherwise never match
    val lowered = words.map(_.toLowerCase)
    val ts = split(lower(trim(col(textCol))), "\\s+")
    docs.select(
      col(idCol),
      graft.functions.StopwordFunctions.stopword_hits(ts, lowered)
        .cast("long").as("blocked_hits"))
      .withColumn("blocked", col("blocked_hits") > 0)
  }

  /** The filter form: documents with ZERO blocklist hits (C4 drops the
    * whole page on any hit). Null-text rows are dropped too — an
    * unscannable page fails closed, matching the published pipelines.
    */
  def blocklistFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      words: Seq[String]): DataFrame = {
    require(words.nonEmpty, "blocklistFilter: empty blocklist")
    // the verdict is row-local, so the filter is a plain codegen'd
    // predicate — no join, nothing shuffles
    val ts = split(lower(trim(col(textCol))), "\\s+")
    docs.filter(graft.functions.StopwordFunctions
      .stopword_hits(ts, words.map(_.toLowerCase)) === 0)
  }
}
