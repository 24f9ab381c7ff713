package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

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

  /** Dot product of two float arrays; caller checks length equality.
    * Element accessors, not `toFloatArray()`: the bulk form allocates and
    * copies BOTH arrays per invocation — on an all-pairs scorer that is
    * two heap copies per pair, and the copy traffic (not the FMAs)
    * dominated a profiled brute-force run. `getFloat` on UnsafeArrayData
    * is a single unsafe read, and the call site is monomorphic enough for
    * the JIT to inline.
    */
  def vectorDot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** L2 norm of a float array (element accessors — see [[vectorDot]]). */
  def vectorNorm(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  /** Largest |component| of a float vector. */
  def vectorMaxAbs(a: ArrayData): Double = {
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getFloat(i).toDouble)
      if (v > m) m = v
      i += 1
    }
    m
  }

  /** Symmetric int8 quantization: round(v / (maxabs/127)), clamped. */
  def quantizeInt8(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    val m = vectorMaxAbs(a)
    if (m == 0.0) return out
    val inv = 127.0 / m
    var i = 0
    while (i < n) {
      val q = Math.round(a.getFloat(i).toDouble * inv)
      out(i) = (if (q > 127) 127 else if (q < -127) -127 else q).toByte
      i += 1
    }
    out
  }

  /** Integer dot of two equal-length int8 vectors. */
  def int8Dot(a: Array[Byte], b: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    acc
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

  /** `split(trim(text), "\\s+")` — the exact composed form the n-gram
    * kernels replace: UTF8String.trim (space-only, like Spark's `trim()`)
    * then the same `Pattern.split(_, -1)` Spark's `StringSplit` runs. Kept
    * bit-identical so the native kernels can never drift from the oracle
    * semantics the composed expressions established.
    */
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** All word n-grams in order (duplicates kept unless `distinct`), each
    * joined by a single space — one split for the whole document.
    *
    * The composed form (`transform(sequence(...), i => concat_ws(" ",
    * slice(split(...), i, n)))`) re-evaluates the SPLIT once per output
    * element in Spark's interpreted higher-order path — O(words × len)
    * per document, which a 13-gram contamination sweep over real corpus
    * documents turns into minutes of single-task CPU. This kernel is
    * O(len + output) and lives inside whole-stage codegen.
    */
  def wordNGrams(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = Whitespace.split(text.trim().toString, -1)
    val count = toks.length - (n - 1)
    if (count < 1) return new GenericArrayData(Array.empty[Any])
    if (!distinct) {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = UTF8String.fromString(joinGram(toks, i, n))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // LinkedHashSet = array_distinct semantics: first occurrence wins,
      // encounter order preserved
      val seen = new java.util.LinkedHashSet[String](count * 2)
      var i = 0
      while (i < count) {
        seen.add(joinGram(toks, i, n))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  private def joinGram(toks: Array[String], start: Int, n: Int): String = {
    if (n == 1) return toks(start)
    val sb = new java.lang.StringBuilder(32)
    var k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append(toks(start + k))
      k += 1
    }
    sb.toString
  }

  /** Character n-grams — one byte walk for the whole document. `distinct`
    * keeps first-occurrence order (the shingle-set view); duplicates-kept
    * preserves every position (the language-model counting view).
    *
    * The composed form (`transform(sequence(...), i => substr(text, i,
    * n))`) pays an O(i) code-point seek per position — O(len²) per
    * document. Here one pass records every UTF-8 char start, then each
    * gram is a byte-range slice at exactly the boundaries `substr`'s
    * code-point arithmetic would pick — O(len + output), codegen-resident.
    */
  def charNGrams(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = text.getBytes
    // char starts = non-continuation bytes (0b10xxxxxx are continuations)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    val count = nChars - (n - 1)
    if (count < 1) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = bytes.length
    if (!distinct) {
      val out = new Array[Any](count)
      var p = 0
      while (p < count) {
        out(p) = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, starts(p), starts(p + n)))
        p += 1
      }
      return new GenericArrayData(out)
    }
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var p = 0
    while (p < count) {
      val from = starts(p)
      val until = starts(p + n)
      seen.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until)))
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  private final val WinnowSeed = 0x817e55edL

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): hash every
    * character `k`-gram, slide a window of `w` consecutive gram hashes,
    * keep each window's MINIMUM hash, return the distinct kept values in
    * first-window order. Any two documents sharing a substring of
    * `k + w − 1` characters are guaranteed to share at least one
    * fingerprint (every such run contains a full window on both sides),
    * while only ~2/(w+1) of positions survive — the sampling that makes
    * substring-level dedup joinable at corpus scale.
    *
    * Selection is by hash VALUE, not position, so the rightmost-vs-
    * leftmost tie rule of the paper (needed there for match localization)
    * is moot here: equal hashes in a window contribute one identical
    * fingerprint either way, and the value-set is tie-free deterministic.
    *
    * One byte walk for char boundaries (same code-point arithmetic as
    * `substr`), one hash per gram, then an O(nGrams) monotonic-deque
    * window minimum — no O(n·w) rescan. Short documents (fewer than `k`
    * chars) hash their full text as the single gram; fewer than `w` grams
    * yields the min over all of them, so every non-empty document gets at
    * least one fingerprint.
    *
    * `portable = true` hashes grams with the first 48 bits of MD5 — the
    * cross-engine-reproducible form (DuckDB/any SQL: `CAST('0x' ||
    * substr(md5(gram), 1, 12) AS BIGINT)`), the right choice when the
    * fingerprint index is persisted and must outlive this engine.
    * `portable = false` swaps in XXH64 for ~10× cheaper gram hashing when
    * fingerprints stay internal to one job.
    */
  def winnowFingerprints(
      text: UTF8String, k: Int, w: Int, portable: Boolean): ArrayData = {
    val bytes = text.getBytes
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    if (nChars == 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = bytes.length

    val nGrams = math.max(nChars - k + 1, 1)
    val h = new Array[Long](nGrams)
    val digest =
      if (portable) java.security.MessageDigest.getInstance("MD5") else null
    var p = 0
    while (p < nGrams) {
      val from = starts(p)
      val until = starts(math.min(p + k, nChars))
      if (portable) {
        digest.reset()
        digest.update(bytes, from, until - from)
        val d = digest.digest()
        h(p) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
          ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
          ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      } else {
        h(p) = XXH64.hashUTF8String(
          UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, from, until)), WinnowSeed)
      }
      p += 1
    }

    // sliding-window minimum via monotonic deque of indices
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // live indices in dq[head, tail)
    var j = 0
    while (j < nGrams) {
      while (tail > head && h(dq(tail - 1)) >= h(j)) tail -= 1
      dq(tail) = j
      tail += 1
      if (dq(head) < j - w + 1) head += 1
      if (j >= w - 1 || j == nGrams - 1) seen.add(h(dq(head)))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  private final val DeletionSeed = 0x6de1e7e5L

  /** Distinct 64-bit hashes of every variant of `text` with up to `d`
    * characters deleted (d ∈ {1, 2}), the original included — the FastSS
    * deletion neighborhood. Two strings within Levenshtein distance d
    * share at least one neighborhood member (delete each edit's touched
    * position from whichever side carries it), so an equi-join on these
    * hashes is a COMPLETE candidate generator for an edit-distance join;
    * false positives are removed by the exact `levenshtein` verify.
    *
    * Hashes, not variant strings, cross the wire: 8 bytes per candidate
    * key instead of a near-full copy of the document key. Variants are
    * deduplicated (equal characters at different positions collide), and
    * deletions index UTF-16 code units — consistent on both sides of the
    * join, which is all completeness needs (astral-plane text can only
    * add false candidates, never drop true ones, and the verify is exact).
    *
    * Cost: O(n²) variants of O(n) hashing each at d=2 — sized for join
    * KEYS (tens of characters), not whole documents; callers key long
    * text on a bounded prefix/normalized form.
    */
  def deletionHashes(text: UTF8String, d: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    val set = new java.util.TreeSet[java.lang.Long]()
    @inline def add(v: String): Unit = {
      set.add(XXH64.hashUTF8String(UTF8String.fromString(v), DeletionSeed))
      ()
    }
    add(s)
    if (d >= 1) {
      var i = 0
      while (i < n) {
        add(s.substring(0, i) + s.substring(i + 1))
        i += 1
      }
    }
    if (d >= 2) {
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          // delete positions i and j (i < j): three untouched segments
          add(s.substring(0, i) + s.substring(i + 1, j) + s.substring(j + 1))
          j += 1
        }
        i += 1
      }
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }

  // ----------------------------------------------- portable (MD5) hashing
  //
  // The PORTABLE hash family: every value below is re-derivable in any
  // engine with an md5() function (DuckDB: `('0x' || substr(md5(s), 1, 15))
  // ::BIGINT`), which is what lets the minhash/simhash DECLARATIONS carry
  // full value oracles instead of recall-only companions (the same trick as
  // [[winnowFingerprints]]'s MD5₄₈ grams and `Similarity.md5Planes`). The
  // engine-internal XXH64 family stays the cheap production default — MD5
  // costs ~10× more per gram; portable is the right trade when signatures
  // must be reproduced by an independent engine (oracles, cross-system
  // index exchange).

  /** 2⁶¹ − 1, the Mersenne prime used as the modulus of the portable
    * affine permutation family (universal hashing over a prime field —
    * Carter & Wegman 1979).
    */
  final val Mersenne61: Long = (1L << 61) - 1

  /** `(a·x + b) mod (2⁶¹ − 1)` in pure 64-bit arithmetic, for
    * `0 ≤ a ≤ 2⁶⁰, 0 ≤ x < 2⁶⁰, 0 ≤ b < 2⁶¹ − 1`: the 121-bit product is
    * split into 61-bit limbs via `multiplyHigh` and folded with
    * `2⁶¹ ≡ 1 (mod p)`. Exactly the value `(a::HUGEINT * x + b) % p`
    * yields in 128-bit SQL arithmetic — the cross-engine contract.
    */
  def mulAddMod61(a: Long, x: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, x) // operands < 2^61: signed == unsigned
    val lo = a * x
    var s = (lo & Mersenne61) +
      (((lo >>> 61) | (hi << 3)) & Mersenne61) + (hi >>> 58)
    s = (s & Mersenne61) + (s >>> 61)
    if (s >= Mersenne61) s -= Mersenne61
    s += b
    if (s >= Mersenne61) s -= Mersenne61
    s
  }

  /** First 60 bits of `md5(utf8 bytes)` (= first 15 hex chars of the
    * digest, big-endian): a portable base hash that always fits a signed
    * 64-bit SQL integer. SQL twin: `('0x' || substr(md5(s),1,15))::BIGINT`.
    */
  def md5Base60(s: UTF8String): Long =
    md5Base60(java.security.MessageDigest.getInstance("MD5"), s)

  /** Per-row callers reuse ONE digest instance across the token loop —
    * `MessageDigest.getInstance` per element would dominate the hash cost.
    */
  private def md5Base60(md: java.security.MessageDigest, s: UTF8String): Long = {
    md.reset()
    digestTop60(md.digest(s.getBytes))
  }

  /** k-lane PORTABLE MinHash signature: lane j applies the affine
    * permutation `(coefA(j)·base + coefB(j)) mod (2⁶¹−1)` to each
    * shingle's [[md5Base60]] and keeps the minimum. One MD5 per shingle,
    * k cheap field ops — same one-hash-k-mixes shape as [[minhash]], but
    * every lane value is re-derivable in SQL. Empty/all-null arrays yield
    * `Long.MaxValue` sentinels (> p, so they can never collide with a real
    * signature value in a band join).
    */
  def minhashPortable(
      shingles: ArrayData, coefA: Array[Long], coefB: Array[Long]): ArrayData = {
    val k = coefA.length
    val mins = Array.fill(k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = md5Base60(md, shingles.getUTF8String(i))
        var j = 0
        while (j < k) {
          val h = mulAddMod61(coefA(j), base, coefB(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 60-bit PORTABLE SimHash over a token array: per-bit ±1 votes from
    * each token's [[md5Base60]]; signature bit j is 1 iff the vote sum is
    * strictly positive (ties → 0, same rule as [[simhash64]]). 60 bits
    * (not 64) so the signature and its 15-bit pigeonhole chunks stay
    * representable in a signed SQL BIGINT end-to-end.
    */
  def simhash60Md5(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Base60(md, tokens.getUTF8String(i))
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** DSIR feature-hash kernel: bucket ids of every unigram AND bigram of
    * a raw text in ONE byte scan — tokenization (maximal runs of
    * non-ASCII-whitespace bytes; multibyte UTF-8 is ≥ 0x80 so a bytewise
    * scan can never split a code point) is FUSED with the hashing:
    * `bucket = md5Base60(salt|gram) mod buckets`, gram = token or
    * `token + " " + next`, digests fed from offsets into the original
    * byte array. No regex split, no token-array materialization, no
    * hex/decimal string round-trips, one reused digest per row — the
    * composed column form (split + explode + concat + md5-hex +
    * substring + conv PER GRAM) pays all of those on the hottest path of
    * the whole selection. Equivalent to hashing
    * `filter(split(trim(text), "\\s+"), length > 0)` grams: both define
    * tokens as maximal non-whitespace runs under Java's ASCII `\s`
    * class. One caveat to that equivalence: Java's `\s` (and this
    * kernel) counts 0x0B vertical tab as whitespace, while RE2-based
    * engines (DuckDB's regexp_split_to_array) EXCLUDE 0x0B from `\s` —
    * a document containing a vertical tab tokenizes differently across
    * the two. The testdata corpora contain no 0x0B so oracle parity
    * holds; when cross-engine replay matters, normalize 0x0B away at
    * ingest. SQL twin per element: `('0x' || substr(md5(salt || '|' ||
    * gram), 1, 15))::BIGINT % buckets`. Output length 2n−1 (n ≥ 1):
    * unigrams first, then bigrams, multiplicity preserved — the
    * generative bag-of-n-grams model counts occurrences, not distinct
    * grams.
    */
  def dsirGramBuckets(
      text: UTF8String, buckets: Long, saltPrefix: Array[Byte]): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    def ws(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' ||
        b == '\r'
    // token boundary scan: starts(i) inclusive, ends(i) exclusive
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var n = 0
    var i = 0
    while (i < len) {
      while (i < len && ws(bytes(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && !ws(bytes(i))) i += 1
        if (n == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(n) = s; ends(n) = i; n += 1
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](if (n >= 1) 2 * n - 1 else 0)
    i = 0
    while (i < n) {
      md.reset()
      md.update(saltPrefix)
      md.update(bytes, starts(i), ends(i) - starts(i))
      out(i) = digestTop60(md.digest()) % buckets
      i += 1
    }
    i = 0
    while (i < n - 1) {
      md.reset()
      md.update(saltPrefix)
      md.update(bytes, starts(i), ends(i) - starts(i))
      md.update(' '.toByte)
      md.update(bytes, starts(i + 1), ends(i + 1) - starts(i + 1))
      out(n + i) = digestTop60(md.digest()) % buckets
      i += 1
    }
    new GenericArrayData(out)
  }

  /** First 60 bits of an MD5 digest, the [[md5Base60]] extraction. */
  private def digestTop60(d: Array[Byte]): Long = {
    val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }
}
