package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Interpreted/codegen-shared kernels for graft's custom expressions.
  *
  * Each expression's `nullSafeEval` AND its generated Java call the same
  * static method here (a top-level Scala object emits static forwarders, so
  * `graft.functions.ExprRuntimes.x(...)` is callable from Janino-compiled
  * code). Keeping one kernel guarantees the interpreted and codegen paths
  * cannot diverge, and the generated call sites stay inside whole-stage
  * codegen with no per-row boxing or reflection (the CodegenFallback cost).
  */
object ExprRuntimes {

  /** Dot product of two float arrays; caller checks length equality. */
  def vectorDot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    var acc = 0.0
    var i = 0
    while (i < x.length) {
      acc += x(i).toDouble * y(i).toDouble
      i += 1
    }
    acc
  }

  /** L2 norm of a float array. */
  def vectorNorm(a: ArrayData): Double = {
    val x = a.toFloatArray()
    var acc = 0.0
    var i = 0
    while (i < x.length) {
      acc += x(i).toDouble * x(i).toDouble
      i += 1
    }
    math.sqrt(acc)
  }

  /** Jaccard of two sorted, distinct string arrays via merge walk. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** k-lane MinHash signature via the Kirsch–Mitzenmacher construction
    * (Kirsch & Mitzenmacher 2006, "Less Hashing, Same Performance"): lane
    * j's hash of a shingle is `h1 + j·h2` from TWO real hashes, so the
    * per-shingle inner loop is k adds/mins instead of k full XXH64
    * avalanche mixes — the hot loop of a corpus-scale dedup sweep, ~6×
    * cheaper per shingle at k=128 with the same pairwise LSH statistics.
    * `h2` is forced odd so `x → x + j·h2 (mod 2^64)` is a bijection per
    * lane (no degenerate stride, lanes stay distinct permutations).
    */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h1 = XXH64.hashUTF8String(shingles.getUTF8String(i), 0L)
        val h2 = XXH64.hashLong(h1, 1L) | 1L
        var h = h1
        var j = 0
        while (j < k) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash of a token array: per-bit ±1 votes from token hashes. */
  def simhash64(tokens: ArrayData, seed: Long): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(i), seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
