package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary: at most `capacity` counters plus a
  * running total of "decrement rounds". Estimates are one-sided:
  * `est <= true <= est + rounds` for EVERY item (tracked or not — an
  * untracked item has est 0), and any item with true frequency
  * `> n / (capacity + 1)` is guaranteed present. Summaries are mergeable
  * (Agarwal et al., "Mergeable Summaries", PODS'12): sum counts on the
  * key union, then trim back to `capacity` by subtracting the
  * (capacity+1)-th largest count — the error bounds add.
  */
final class MgSummary(val capacity: Int) {
  val counts = new java.util.HashMap[String, java.lang.Long](capacity * 2)
  /** Total count subtracted from every (implicit) counter so far — the
    * one-sided error bound on every estimate.
    */
  var rounds: Long = 0L

  def offer(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != null) { counts.put(item, cur + 1L); () }
    else if (counts.size < capacity) { counts.put(item, 1L); () }
    else {
      // full and item untracked: classic MG decrement round — every
      // counter (and the arriving occurrence) loses 1. Each round removes
      // capacity+1 units of stream mass, which is where the
      // n/(capacity+1) guarantee comes from; counters hitting 0 free
      // their slots, so the scan cost amortizes to O(1) per update (each
      // decrement is charged against the increment that created it).
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - 1L
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
      rounds += 1L
    }
  }

  /** Merge `other` into this: sum counts over the key union, then trim
    * to `capacity` survivors by subtracting the (capacity+1)-th largest
    * combined count from everything.
    */
  def absorb(other: MgSummary): Unit = {
    rounds += other.rounds
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      val vi = counts.values().iterator()
      var i = 0
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      val it2 = counts.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val nv = e.getValue - cut
        if (nv <= 0L) it2.remove() else e.setValue(nv)
      }
      rounds += cut
    }
  }

  /** Entries sorted by (estimate desc, item asc) — deterministic output. */
  def sorted: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue.longValue); i += 1 }
    arr.sortBy { case (item, est) => (-est, item) }
  }
}

/** Approximate heavy hitters as a native mergeable aggregate:
  * `graft_heavy_hitters(item, capacity)` returns
  * `array<struct<item string, est bigint, err bigint>>` sorted by
  * estimate descending, where `est <= true_count <= est + err` and every
  * item with frequency above `n / (capacity + 1)` is guaranteed to
  * appear.
  *
  * 100 TB shape: the partial (map-side) phase collapses each partition to
  * at most `capacity` counters before the exchange, and merges are
  * O(capacity log capacity) — the shuffle carries O(groups × capacity)
  * rows no matter how many items streamed through, which is what
  * `groupBy(item).count().orderBy(desc).limit(k)` (a full shuffle of
  * every distinct item plus a global sort) cannot promise on a skewed
  * 100 TB column. With `capacity` above the column's distinct count no
  * trim ever fires and the result is EXACT (err 0) — the oracle-checked
  * regime of q57; the approximate regime's bounds are spec-tested.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] with UnaryLike[Expression] {

  require(capacity >= 1 && capacity <= 65536,
    s"heavy-hitters capacity out of 1..65536: $capacity")

  override def prettyName: String = "graft_heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buffer: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgSummary, input: MgSummary): MgSummary = {
    buffer.absorb(input)
    buffer
  }

  override def eval(buffer: MgSummary): Any =
    new GenericArrayData(buffer.sorted.map { case (item, est) =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(item), est, buffer.rounds))
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.rounds)
    out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MgSummary(capacity)
    s.rounds = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      s.counts.put(in.readUTF(), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

object FreqFunctions {
  /** Heavy-hitters aggregate for `agg(...)`: item column must be string. */
  def heavyHitters(item: Column, capacity: Int): Column =
    GraftShim.column(
      HeavyHitters(GraftShim.expression(item), capacity)
        .toAggregateExpression())
}
