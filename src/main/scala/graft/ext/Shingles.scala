package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization / shingling building blocks shared by the dedup and text
  * operators. All pure `functions._` compositions — no UDFs — so they stay
  * inside Catalyst and distribute trivially.
  */
object Shingles {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct whitespace tokens (the unigram shingle set). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** ALL word n-grams in order, duplicates kept (the multiset view —
    * repetition analysis needs the duplicates that [[wordNGrams]] drops).
    * Empty when the document has fewer than n tokens, or is null (the
    * original composed form's `when`/`otherwise` fell through to empty on
    * null — preserved here via coalesce).
    *
    * Native [[graft.functions.WordNGrams]] under the hood: the composed
    * `transform(sequence, i => concat_ws(slice(split...)))` form
    * re-evaluates the split per output gram in Spark's interpreted
    * higher-order path — O(words × len) per document, minutes of
    * single-task CPU on a real 13-gram contamination sweep.
    */
  def wordNGramsAll(text: Column, n: Int): Column =
    coalesce(graft.functions.NGrams.wordNGramsAll(text, n),
      array().cast("array<string>"))

  /** Distinct word n-grams joined by a single space. */
  def wordNGrams(text: Column, n: Int): Column =
    coalesce(graft.functions.NGrams.wordNGrams(text, n),
      array().cast("array<string>"))

  /** Distinct character n-grams of the raw text. Robust to word reordering
    * (intra-word grams survive a shuffle of the words), which is the planted
    * near-dup pattern in LLM training corpora: same content, new order.
    * Native [[graft.functions.CharNGrams]]: the composed `substr(text, i,
    * n)` form pays an O(i) code-point seek per position — O(len²)/doc.
    */
  def charNGrams(text: Column, n: Int): Column =
    coalesce(graft.functions.NGrams.charNGrams(text, n),
      array().cast("array<string>"))

  /** ALL character n-grams in order, duplicates kept — every position
    * counts once, which is what language-model counting needs.
    */
  def charNGramsAll(text: Column, n: Int): Column =
    coalesce(graft.functions.NGrams.charNGramsAll(text, n),
      array().cast("array<string>"))

  /** Exact Jaccard similarity of two array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Normalized text: lowercase, trimmed, whitespace collapsed. */
  def normalizeText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))
}
