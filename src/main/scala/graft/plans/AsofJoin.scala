package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator Catalyst extension stack
  * (logical node → Strategy → physical operator) for the one join shape
  * Spark's built-ins lack: "each left row matched to the LATEST right row
  * with the same key and right.time <= left.time".
  *
  * The composed alternative (q18's union + running-last window) is
  * correct and one-shuffle, but it materializes both sides into one
  * window partition stream. This operator keeps the sides separate:
  * EnsureRequirements co-partitions them on the key and sorts each by
  * (key, time) — exactly a sort-merge join's requirements — and the
  * merge itself is a single forward pass per partition: O(|L|+|R|) with
  * one buffered right row, no window state, no per-key memory. At 100 TB
  * both sides shuffle once on the key and stream through the merge, the
  * same scaling story as SMJ.
  *
  * Key/time columns are carried as SIDE-LOCAL ORDINALS, not attributes:
  * self-joins reuse exprIds across sides (DeduplicateRelations cannot
  * know which side an ambiguous attribute belongs to in a custom node),
  * while ordinals are unambiguous by construction. `references` declares
  * the full child output so column pruning never reshapes the children
  * under the ordinals.
  *
  * Left-outer semantics: unmatched left rows pad the right side with
  * nulls; null keys/times never match (standard as-of semantics).
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeyIdx: Int,
    rightKeyIdx: Int,
    leftTimeIdx: Int,
    rightTimeIdx: Int) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] as [[AsofJoinExec]]; a no-op for everything else. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeyIdx: Int,
    rightKeyIdx: Int,
    leftTimeIdx: Int,
    rightTimeIdx: Int) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  private def lKey = left.output(leftKeyIdx)
  private def rKey = right.output(rightKeyIdx)
  private def lTime = left.output(leftTimeIdx)
  private def rTime = right.output(rightTimeIdx)

  // co-partition on the key, sort each side by (key, time): the planner
  // inserts the Exchange/Sort pair exactly as it would for a sort-merge
  // join, and AQE remains free to pick partition counts
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(lKey)) :: ClusteredDistribution(Seq(rKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(lKey, Ascending), SortOrder(lTime, Ascending)) ::
      Seq(SortOrder(rKey, Ascending), SortOrder(rTime, Ascending)) :: Nil
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BoundReference(leftKeyIdx, lKey.dataType, lKey.nullable)
    val ltB = BoundReference(leftTimeIdx, lTime.dataType, lTime.nullable)
    val rkB = BoundReference(rightKeyIdx, rKey.dataType, rKey.nullable)
    val rtB = BoundReference(rightTimeIdx, rTime.dataType, rTime.nullable)
    val keyOrd = TypeUtils.getInterpretedOrdering(lKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(lTime.dataType)
    val nRight = right.output.length
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      // the latest right row (copied — iterator rows are reused) whose
      // (key, time) is <= the current left row's; valid only while the
      // left key equals lastKey
      var lastMatch: InternalRow = null
      var lastKey: Any = null

      lIter.map { lRow =>
        val lk = lkB.eval(lRow)
        val lt = ltB.eval(lRow)
        if (lk == null || lt == null) {
          toUnsafe(joined(lRow, nullRight))
        } else {
          // drop the remembered match when the left key moves on. The key
          // must be COPIED before it is stored: eval on an UnsafeRow-backed
          // iterator returns views into a reused buffer for non-primitive
          // types (UTF8String, Decimal, structs), so a stored reference
          // would mutate under us when the left iterator advances and the
          // stale-key comparison could spuriously equal, leaking a
          // lastMatch across key boundaries.
          if (lastKey == null || keyOrd.compare(lastKey, lk) != 0) {
            lastMatch = null
            lastKey = InternalRow.copyValue(lk)
          }
          // advance the right side through every row with key < lk, or
          // key == lk and time <= lt; remember the last qualifying row
          var advance = true
          while (advance && rBuf.hasNext) {
            val rRow = rBuf.head
            val rk = rkB.eval(rRow)
            val rt = rtB.eval(rRow)
            if (rk == null || rt == null) {
              rBuf.next() // null keys/times never match
            } else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) rBuf.next()
              else if (c == 0 && timeOrd.compare(rt, lt) <= 0) {
                lastMatch = rBuf.next().copy()
              } else advance = false
            }
          }
          toUnsafe(joined(lRow, if (lastMatch != null) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  /** Left as-of join `left` with `right` on equal `key`, matching the
    * latest right row with `right.<rightTime> <= left.<leftTime>`.
    * Registers the planner strategy on the session idempotently, so
    * callers need no extension config (GraftExtensions also injects it
    * at startup). */
  def apply(left: DataFrame, right: DataFrame,
            key: String, leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val lp = left.queryExecution.analyzed
    // Re-alias every right-side output attribute with a fresh exprId
    // (mirroring what DeduplicateRelations does for built-in joins): in a
    // self-join both sides derive from the same relation and share
    // exprIds, and downstream attribute binding resolves by FIRST exprId
    // match — a duplicated right column would silently bind to the left
    // ordinal (e.g. a right key selected after the join would read the
    // non-null left key on unmatched rows instead of NULL).
    val rp = {
      val analyzed = right.queryExecution.analyzed
      val fresh = analyzed.output.map { a =>
        org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()
      }
      org.apache.spark.sql.catalyst.plans.logical.Project(fresh, analyzed)
    }
    def idx(p: LogicalPlan, name: String): Int = {
      val i = p.output.indexWhere(_.name == name)
      require(i >= 0, s"column $name not in ${p.output.map(_.name).mkString(", ")}")
      i
    }
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark,
      AsofJoinPlan(lp, rp, idx(lp, key), idx(rp, key),
        idx(lp, leftTime), idx(rp, rightTime)))
  }
}
