package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded accumulator for [[TopKPairs]]: a fixed-capacity binary heap
  * rooted at the WORST kept entry under "higher score wins, score ties to
  * the smaller id" — so admitting a better candidate into a full heap is
  * one root replacement + sift, O(log k), and memory is exactly k entries
  * in two primitive arrays (no boxing, no per-row allocation).
  */
/** @param dedupIds skip an offered (score, id) when an entry with the same
  *   id is already held — lets LSH callers feed the raw multi-band
  *   candidate stream (one row per colliding band) without a distinct()
  *   exchange first; the O(k) membership scan is only paid when enabled
  *   and k is small for ranking workloads.
  */
final class TopKHeap(val k: Int, val dedupIds: Boolean = false) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  private def contains(id: Long): Boolean = {
    var i = 0
    while (i < n) { if (ids(i) == id) return true; i += 1 }
    false
  }

  /** Is (sa, ia) worse than (sb, ib)? Heap order: parent worse than child.
    * Total order via Double.compare so a NaN (ranked largest, as in SQL
    * ORDER BY) can never wedge itself into an unevictable heap slot.
    */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

  def offer(s: Double, id: Long): Unit =
    if (dedupIds && contains(id)) ()
    else if (n < k) {
      var i = n
      scores(i) = s; ids(i) = id; n += 1
      // sift up: swap while this entry is worse than its parent
      while (i > 0 && worse(s, id, scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = s; ids(p) = id
        i = p
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      // candidate beats the worst kept: replace the root, sift down toward
      // the worse child so the new worst bubbles back to the root
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i // index of the worst among i and its children
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true
        else {
          val ts = scores(i); val ti = ids(i)
          scores(i) = scores(w); ids(i) = ids(w)
          scores(w) = ts; ids(w) = ti
          i = w
        }
      }
    }

  def absorb(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { offer(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Kept entries, best first (score desc, id asc). */
  def sortedIndices: Array[Int] =
    Array.range(0, n).sortWith { (a, b) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
    }
}

/** Native bounded top-k aggregate over `struct(score: double, id: bigint)`
  * rows: keeps the k best per group (score desc, ties to the smaller id)
  * and returns them best-first as `array<struct<score, id>>`.
  *
  * This is the aggregate SURVEY.md §7.3 calls out as the one genuine
  * custom-aggregate candidate. Versus the `row_number() over (partitionBy
  * group orderBy score desc)` formulation it replaces: the window SHUFFLES
  * AND SORTS every candidate row, while this aggregate's partial (map-side)
  * phase collapses each partition to at most k entries per group before
  * the exchange — on an ANN candidate set the shuffle carries
  * O(groups x k) rows instead of O(candidates), and nothing is ever
  * globally sorted. That asymmetry is what survives a 100 TB corpus.
  *
  * Buffer is [[TopKHeap]] (primitive arrays, O(log k) insert); serialized
  * form is `[n:int][n x (score:double, id:long)]`.
  */
case class TopKPairs(
    child: Expression,
    k: Int,
    dedupIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with UnaryLike[Expression] {

  require(k > 0, "top-k k must be positive")

  override def prettyName: String = "graft_top_k"

  /** Reject anything but struct<double, bigint> at analysis time: the
    * buffer reads raw words (`getDouble(0)`/`getLong(1)`), so a mistyped
    * id column would silently corrupt ids instead of failing the query.
    */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
        if a.dataType == DoubleType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires struct<score: double, id: bigint> input, got " +
          other.simpleString)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k, dedupIds)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val s = row.getDouble(0)
        // NaN scores (e.g. cosine of a zero-norm vector) are not meaningful
        // ranks: skip them rather than letting them occupy a top-k slot.
        if (!s.isNaN) buffer.offer(s, row.getLong(1))
      }
    }
    buffer
  }

  override def merge(buffer: TopKHeap, input: TopKHeap): TopKHeap = {
    buffer.absorb(input)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedIndices.map { i =>
      new GenericInternalRow(
        Array[Any](buffer.scores(i), buffer.ids(i)))
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.n)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt()
    val h = new TopKHeap(k, dedupIds)
    var i = 0
    while (i < m) { h.offer(bb.getDouble(), bb.getLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKPairs =
    copy(child = newChild)
}

object TopKFunctions {
  /** Bounded top-k aggregate: `top_k_pairs(struct(score, id), k)` inside a
    * `groupBy(...).agg(...)`; returns `array<struct<score, id>>` best
    * first. `id` must be BIGINT, `score` DOUBLE.
    *
    * `dedupIds = true` additionally keeps at most one entry per id —
    * PRECONDITION: within a group, every occurrence of an id carries the
    * same score (true for deterministic similarity scores replayed once
    * per LSH band collision). This lets candidate streams skip the
    * distinct() exchange that would otherwise shuffle the full candidate
    * set before ranking.
    */
  def top_k_pairs(
      scoreAndId: Column, k: Int, dedupIds: Boolean = false): Column =
    GraftShim.column(
      TopKPairs(GraftShim.expression(scoreAndId), k, dedupIds)
        .toAggregateExpression())
}
