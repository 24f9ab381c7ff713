package graft

import org.apache.spark.sql.{GraftShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryMinus}

import graft.functions._

/** SQL-surface registration: installs graft's native expressions as SQL
  * functions so `spark.sql("SELECT graft_simhash64(...)")` works without
  * touching the Scala API. Two entry points, one registration table:
  *
  *  - new sessions: `.config("spark.sql.extensions", "graft.GraftExtensions")`
  *    (the standard `SparkSessionExtensions` injection);
  *  - live sessions: `GraftExtensions.install(spark)` (registers on the
  *    session's FunctionRegistry — no restart).
  *
  * Integer-ish parameters (k, seed) arrive as literal arguments: SQL has
  * no constructor-parameter channel, so they are extracted from foldable
  * int/long literals at resolution time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftExtensions {

  /** Register every graft function on an already-running session. */
  def install(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      GraftShim.registerFunction(spark, id, info, builder)
    }

  private type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private lazy val registrations: Seq[Registration] = Seq(
    make("graft_minhash", "k-seed MinHash signature of array<string>",
      "graft_minhash(tokens, k)") {
      case Seq(tokens, k) => MinHashSignature(tokens, intArg(k, "k"))
    },
    make("graft_simhash64", "64-bit SimHash of array<string>",
      "graft_simhash64(tokens[, seed])") {
      case Seq(tokens)       => SimHash64(tokens, 0L)
      case Seq(tokens, seed) => SimHash64(tokens, longArg(seed, "seed"))
    },
    make("graft_xxhash64_seeded", "seeded xxHash64 of a string",
      "graft_xxhash64_seeded(s, seed)") {
      case Seq(s, seed) => XxHash64Seeded(s, longArg(seed, "seed"))
    },
    make("graft_nfc", "Unicode NFC (canonical composition) of a string",
      "graft_nfc(s)") {
      case Seq(s) => NfcNormalize(s)
    },
    make("graft_jaccard_sorted",
      "Jaccard of two sorted distinct array<string>",
      "graft_jaccard_sorted(a, b)") {
      case Seq(a, b) => JaccardSorted(a, b)
    },
    make("graft_vector_dot", "dot product of two array<float>",
      "graft_vector_dot(a, b)") {
      case Seq(a, b) => FloatVectorDot(a, b)
    },
    make("graft_vector_norm", "L2 norm of array<float>",
      "graft_vector_norm(a)") {
      case Seq(a) => FloatVectorNorm(a)
    },
    make("graft_vector_quantize_int8",
      "symmetric int8 quantization of array<float> to binary",
      "graft_vector_quantize_int8(v)") {
      case Seq(v) => QuantizeInt8(v)
    },
    make("graft_vector_max_abs", "largest |component| of array<float>",
      "graft_vector_max_abs(v)") {
      case Seq(v) => VectorMaxAbs(v)
    },
    make("graft_vector_int8_dot",
      "integer dot of two int8-quantized (binary) vectors as bigint",
      "graft_vector_int8_dot(a, b)") {
      case Seq(a, b) => Int8Dot(a, b)
    },
    make("graft_word_ngrams",
      "word n-grams of a string (single whitespace-split per document); " +
        "distinct=true keeps first occurrences",
      "graft_word_ngrams(text, n[, distinct])") {
      case Seq(text, n)    => WordNGrams(text, intArg(n, "n"), distinct = false)
      case Seq(text, n, d) => WordNGrams(text, intArg(n, "n"), boolArg(d, "distinct"))
    },
    make("graft_char_ngrams",
      "character n-grams of a string (one byte-walk); distinct=true " +
        "(default) keeps first occurrences, false keeps every position",
      "graft_char_ngrams(text, n[, distinct])") {
      case Seq(text, n) => CharNGrams(text, intArg(n, "n"))
      case Seq(text, n, d) =>
        CharNGrams(text, intArg(n, "n"), boolArg(d, "distinct"))
    },
    make("graft_gram_bitmap",
      "one-hash Bloom bitmap (words x 64 bits) of array<string> as " +
        "array<bigint> — pair with graft_bitmap_andnot_count for exact " +
        "containment pruning",
      "graft_gram_bitmap(tokens, words)") {
      case Seq(tokens, w) => GramBitmap(tokens, intArg(w, "words"))
    },
    make("graft_bitmap_andnot_count",
      "popcount(a & ~b) over two array<bigint> bitmaps: a lower bound " +
        "on |A \\ B| for graft_gram_bitmap bitmaps",
      "graft_bitmap_andnot_count(a, b)") {
      case Seq(a, b) => BitmapAndNotCount(a, b)
    },
    make("graft_vector_moments",
      "single-pass moments aggregate over array<float>: " +
        "struct(n, mean array<double>, cov array<double> row-major dxd)",
      "graft_vector_moments(vec)") {
      case Seq(v) => VectorMoments(v)
    },
    // aggregate: the analyzer wraps a bare AggregateFunction in
    // AggregateExpression(Complete) during resolution
    make("graft_top_k",
      "bounded top-k aggregate over struct(score double, id bigint); " +
        "returns array<struct<score, id>> best first",
      "graft_top_k(struct(score, id), k)") {
      case Seq(pair, k) => TopKPairs(pair, intArg(k, "k"))
    },
    make("graft_heavy_hitters",
      "mergeable Misra-Gries heavy-hitters aggregate over a string item " +
        "column; returns array<struct<item, est, err>> sorted by estimate " +
        "descending, est <= true <= est + err",
      "graft_heavy_hitters(item, capacity)") {
      case Seq(item, cap) => HeavyHitters(item, intArg(cap, "capacity"))
    },
    make("graft_winnow",
      "winnowing (MOSS) fingerprints of a string: distinct sliding-" +
        "window minima over char-k-gram hashes as array<bigint>; " +
        "portable=true (default) = MD5-48 gram hashes reproducible by " +
        "any engine, false = XXH64",
      "graft_winnow(text, k, w[, portable])") {
      case Seq(text, k, w) =>
        WinnowFingerprints(text, intArg(k, "k"), intArg(w, "w"),
          portable = true)
      case Seq(text, k, w, p) =>
        WinnowFingerprints(text, intArg(k, "k"), intArg(w, "w"),
          boolArg(p, "portable"))
    },
    make("graft_deletion_hashes",
      "FastSS deletion-neighborhood hashes (distinct bigints) of a " +
        "string for edit-distance blocking, d in 1..2",
      "graft_deletion_hashes(s, d)") {
      case Seq(s, d) => DeletionHashes(s, intArg(d, "d"))
    },
    make("graft_quantile_sketch",
      "mergeable GK quantile-summary aggregate over a numeric column; " +
        "returns the serialized sketch as binary (persistable, " +
        "mergeable with graft_quantile_sketch_merge)",
      "graft_quantile_sketch(v[, relativeError])") {
      case Seq(v)     => QuantileSketchAgg(v, 0.01)
      case Seq(v, re) => QuantileSketchAgg(v, doubleArg(re, "relativeError"))
    },
    make("graft_quantile_sketch_merge",
      "merge aggregate over serialized quantile sketches (binary)",
      "graft_quantile_sketch_merge(sketch[, relativeError])") {
      case Seq(s) => QuantileSketchMergeAgg(s, 0.01)
      case Seq(s, re) =>
        QuantileSketchMergeAgg(s, doubleArg(re, "relativeError"))
    },
    make("graft_quantile_sketch_get",
      "probe a serialized quantile sketch: array<double> aligned with " +
        "the probability literals",
      "graft_quantile_sketch_get(sketch, p1[, p2...])") {
      case args if args.size >= 2 =>
        QuantileSketchQuery(args.head,
          args.tail.map(doubleArg(_, "prob")))
    })

  private def make(name: String, usage: String, example: String)(
      build: PartialFunction[Seq[Expression], Expression]): Registration = {
    val info = new ExpressionInfo(getClass.getName, null, name, usage, example)
    (FunctionIdentifier(name), info, (args: Seq[Expression]) =>
      build.applyOrElse(args, (bad: Seq[Expression]) =>
        throw new IllegalArgumentException(
          s"$name: unsupported argument list (${bad.size} args); usage: $example")))
  }

  private def intArg(e: Expression, name: String): Int = longArg(e, name).toInt

  private def boolArg(e: Expression, name: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be a boolean literal, got: $other")
  }

  private def doubleArg(e: Expression, name: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$name must be a numeric literal, got: $other")
  }

  private def longArg(e: Expression, name: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    // SQL negative numbers parse as UnaryMinus(Literal) — constant folding
    // has not run at function-resolution time
    case UnaryMinus(inner, _) => -longArg(inner, name)
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got: $other")
  }
}
