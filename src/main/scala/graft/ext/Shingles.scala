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
    * Empty when the document has fewer than n tokens (guarded:
    * `sequence(1, 0)` would otherwise count DOWN in Spark).
    */
  def wordNGramsAll(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val count = size(toks) - (n - 1)
    when(count >= 1,
      transform(
        sequence(lit(1), count),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-grams joined by a single space. */
  def wordNGrams(text: Column, n: Int): Column =
    array_distinct(wordNGramsAll(text, n))

  /** Distinct character n-grams of the raw text. Robust to word reordering
    * (intra-word grams survive a shuffle of the words), which is the planted
    * near-dup pattern in LLM training corpora: same content, new order.
    */
  def charNGrams(text: Column, n: Int): Column = {
    val count = length(text) - (n - 1)
    when(count >= 1,
      array_distinct(
        transform(
          sequence(lit(1), count),
          i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

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
