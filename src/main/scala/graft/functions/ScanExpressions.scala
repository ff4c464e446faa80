package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho–Corasick automaton over a fixed pattern set: the
  * classic multi-pattern scanner (Aho & Corasick, CACM 1975) — one walk
  * of the text finds every pattern occurrence, vs N contains() calls
  * re-scanning the text N times. Transitions are a dense next[state][256]
  * table with failure links folded in at build time (the BFS closure),
  * so the hot loop is two array reads per input byte with no branching
  * on misses. Matched patterns accumulate in a 64-bit mask, which caps
  * the family at 64 patterns — the denylist sizes the reference's
  * scrubbing ops use (cf. overseer's handler-side validation walks,
  * src/overseer/core.clj) are far below that.
  *
  * Byte-level matching on UTF-8 equals string containment (a pattern's
  * byte sequence occurs iff the substring occurs), so no decoding happens
  * on the hot path.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.length <= 64,
    s"multi_contains supports 1..64 patterns, got ${patterns.length}")
  require(patterns.forall(_.nonEmpty), "multi_contains patterns must be non-empty")

  // dense goto table, failure-closed: next(s)(b) is the longest-suffix
  // state after reading byte b in state s; outMask(s) ORs the patterns
  // ending at s or at any suffix of s (closed over failure links).
  val (next: Array[Array[Int]], outMask: Array[Long]) = {
    val bytes = patterns.map(_.getBytes("UTF-8"))
    val maxNodes = bytes.map(_.length).sum + 1
    val trie = Array.fill(maxNodes)(Array.fill(256)(-1))
    val mask = new Array[Long](maxNodes)
    var nNodes = 1
    for (i <- bytes.indices) {
      var s = 0
      for (b <- bytes(i)) {
        val c = b & 0xff
        if (trie(s)(c) < 0) { trie(s)(c) = nNodes; nNodes += 1 }
        s = trie(s)(c)
      }
      mask(s) |= 1L << i
    }
    val fail = new Array[Int](nNodes)
    val queue = scala.collection.mutable.Queue.empty[Int]
    for (c <- 0 until 256) {
      val t = trie(0)(c)
      if (t < 0) trie(0)(c) = 0
      else { fail(t) = 0; queue.enqueue(t) }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      mask(s) |= mask(fail(s))
      for (c <- 0 until 256) {
        val t = trie(s)(c)
        if (t < 0) trie(s)(c) = trie(fail(s))(c)
        else { fail(t) = trie(fail(s))(c); queue.enqueue(t) }
      }
    }
    (trie.take(nNodes), mask.take(nNodes))
  }

  /** Distinct indices (ascending) of patterns occurring in the text. */
  def find(text: UTF8String): ArrayData = {
    val bs = text.getBytes
    var s = 0
    var m = 0L
    var i = 0
    while (i < bs.length) {
      s = next(s)(bs(i) & 0xff)
      m |= outMask(s)
      i += 1
    }
    val hits = new Array[Int](java.lang.Long.bitCount(m))
    var j = 0
    var idx = 0
    while (m != 0L) {
      if ((m & 1L) != 0L) { hits(j) = idx; j += 1 }
      m >>>= 1
      idx += 1
    }
    new GenericArrayData(hits)
  }
}

/** Native Catalyst expression: `multi_contains(text, patterns)` returns
  * the ascending array of indices of the patterns contained in text —
  * ONE text walk per row regardless of pattern count. The equivalent
  * built-in spelling (`filter(sequence(...), i -> contains(text, pats[i]))`
  * or an N-way OR of contains) re-scans the row N times and runs the HOF
  * interpreted; this is a single automaton walk inside whole-stage
  * codegen, the right shape for a 64-phrase denylist over 100 TB of text.
  */
case class MultiContains(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"multi_contains requires a string column, got $t")
    }

  // Seq (not Array) field so two identical calls are semanticEquals and
  // Catalyst canonicalization / subexpression elimination can merge them;
  // the automaton materializes the Array internally.
  @transient private lazy val ac = new AcAutomaton(patterns.toArray)

  override def nullSafeEval(input: Any): Any =
    ac.find(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val acRef = ctx.addReferenceObj("acAutomaton", ac,
        classOf[AcAutomaton].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $acRef.find($a);"
    })

  override protected def withNewChildInternal(c: Expression): MultiContains =
    copy(child = c)
}

object ScanFunctions {
  /** Column API: indices of `patterns` occurring as substrings of text. */
  def multi_contains(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiContains(
      ColumnBridge.expression(text), patterns))
}
