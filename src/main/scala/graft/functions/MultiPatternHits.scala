package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern containment counter: how many of `patterns`
  * (duplicates counted separately — an eval suite can repeat a question)
  * occur at least once as a substring of the input string. One O(bytes)
  * scan of the text regardless of pattern count — the scale path for
  * exact-substring decontamination
  * ([[graft.ext.Curation.exactContamination]], reference
  * `datalake_jobs/quality/filters.py` analogue): the composable
  * alternative (`size(filter(typedlit(probes), p => text.contains(p)))`)
  * embeds the whole probe set in the plan as an array literal — a
  * realistic 10⁴–10⁵-probe eval suite breaks codegen on literal size and
  * scans O(probes × doclen) per row.
  *
  * The automaton lives on the expression instance as a reference object
  * (the [[StopwordHits]] pattern): built once lazily per
  * deserialized instance, one generated method call per row. Matching is
  * byte-level over UTF-8 (self-synchronizing, so byte matches are exactly
  * character matches).
  */
case class MultiPatternHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.forall(p => p != null && p.nonEmpty),
    "multi_pattern_hits: null/empty patterns are not meaningful " +
      "(an empty probe would match every document)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val ac = new AhoCorasick(patterns)

  /** Public: called from generated code via a reference object. */
  def hits(text: UTF8String): Long = ac.countContained(text.getBytes)

  override def nullSafeEval(v: Any): Any = hits(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiPatternHits", this,
      classOf[MultiPatternHits].getName)
    defineCodeGen(ctx, ev, a => s"$ref.hits($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte-level Aho-Corasick automaton with dictionary-suffix links.
  *
  * Scan cost is O(bytes + distinct matched nodes) amortized: the
  * dictionary-link walk at each position stops at the first node already
  * stamped for this call (everything beyond it was stamped by the walk
  * that stamped it), and goto misses walk fail links that only ever move
  * the state up the depth it already paid to descend. The per-call
  * "matched" stamps are a thread-local int-generation array, so the
  * shared instance is safe under concurrent task threads without
  * per-row allocation.
  */
private[functions] final class AhoCorasick(patterns: Seq[String])
    extends Serializable {

  // distinct patterns with multiplicities (sorted for determinism)
  private val distinctPats: Array[Array[Byte]] = patterns.distinct.sorted
    .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  private val mult: Array[Long] = {
    val counts = patterns.groupBy(identity).map { case (p, v) =>
      p -> v.size.toLong
    }
    patterns.distinct.sorted.map(counts).toArray
  }

  // trie with edges in one LongMap: key = node << 8 | byte
  private val edges = new scala.collection.mutable.LongMap[Int]()
  private val dictIdBuf = scala.collection.mutable.ArrayBuffer[Int](-1)
  private def edgeKey(node: Int, b: Byte): Long =
    (node.toLong << 8) | (b & 0xffL)

  // build the trie
  for (pi <- distinctPats.indices) {
    var node = 0
    for (b <- distinctPats(pi)) {
      val k = edgeKey(node, b)
      node = edges.getOrElse(k, {
        dictIdBuf += -1
        val fresh = dictIdBuf.size - 1
        edges(k) = fresh
        fresh
      })
    }
    dictIdBuf(node) = pi
  }
  private val nNodes = dictIdBuf.size
  private val dictId = dictIdBuf.toArray
  private val fail = new Array[Int](nNodes)
  // nearest PROPER dictionary suffix via fail chain (-1 = none)
  private val dictLink = new Array[Int](nNodes)

  // BFS fail/dict links
  locally {
    java.util.Arrays.fill(dictLink, -1)
    // child iteration per node for BFS: collect adjacency once
    val childList = Array.fill(nNodes)(List.empty[(Byte, Int)])
    edges.foreach { case (k, child) =>
      val node = (k >>> 8).toInt
      val b = (k & 0xff).toByte
      childList(node) = (b, child) :: childList(node)
    }
    val bfs = new java.util.ArrayDeque[Int]()
    childList(0).foreach { case (_, c) => fail(c) = 0; bfs.add(c) }
    while (!bfs.isEmpty) {
      val u = bfs.poll()
      dictLink(u) =
        if (dictId(fail(u)) >= 0) fail(u) else dictLink(fail(u))
      childList(u).foreach { case (b, v) =>
        // fail(v): longest proper suffix of v's string present in trie
        var f = fail(u)
        var resolved = -1
        while (resolved < 0) {
          edges.get(edgeKey(f, b)) match {
            case Some(t) => resolved = t
            case None => if (f == 0) resolved = 0 else f = fail(f)
          }
        }
        fail(v) = resolved
        bfs.add(v)
      }
    }
  }

  // per-thread match stamps: stamps(node) == gen means "already counted
  // in this call" — no per-row allocation, no cross-thread sharing
  @transient private lazy val scratch =
    new ThreadLocal[(Array[Int], Array[Int])] {
      override def initialValue(): (Array[Int], Array[Int]) =
        (new Array[Int](nNodes), new Array[Int](1))
    }

  /** Sum of multiplicities of the patterns contained in `bytes`. */
  def countContained(bytes: Array[Byte]): Long = {
    val (stamps, genBox) = scratch.get()
    // on Int wrap a node stamped exactly 2^32 calls ago would alias the
    // current gen and silently skip a true match — reset instead
    if (genBox(0) == Int.MaxValue) {
      java.util.Arrays.fill(stamps, 0)
      genBox(0) = 0
    }
    genBox(0) += 1
    val gen = genBox(0)
    var total = 0L
    var state = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      // goto with fail-link fallback
      var s = state
      var next = -1
      while (next < 0) {
        edges.get(edgeKey(s, b)) match {
          case Some(t) => next = t
          case None => if (s == 0) next = 0 else s = fail(s)
        }
      }
      state = next
      // walk the dictionary chain, stopping at the first stamped node
      var t = if (dictId(state) >= 0) state else dictLink(state)
      while (t >= 0 && stamps(t) != gen) {
        stamps(t) = gen
        total += mult(dictId(t))
        t = dictLink(t)
      }
      i += 1
    }
    total
  }
}

object MultiPatternFunctions {
  /** Number of `patterns` (duplicates counted separately) contained in
    * `text` — one Aho-Corasick pass per row.
    */
  def multi_pattern_hits(text: Column, patterns: Seq[String]): Column =
    GraftShim.column(MultiPatternHits(GraftShim.expression(text), patterns))
}
