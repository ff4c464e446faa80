package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming DGIM window counter — the online twin of q567's batch fold
  * (`ops/DgimOps`), the 17th streaming module. DGIM IS an online
  * algorithm (Datar et al. 2002 define it on a stream): the state is
  * the O(log² W) bucket list plus the stream clock, and folding a batch
  * of bits applies EXACTLY the batch transition — expire, prepend on a
  * 1-bit, cascade-merge the two oldest of any size that reaches three —
  * so as long as bits arrive in stream order, stream ≡ batch
  * STATE-IDENTICALLY under any slicing (DgimStreamSpec asserts the
  * bucket lists equal the `DgimOps.dgimFoldSql` SQL fold on the same
  * bits — a cross-implementation check, not a self-check).
  *
  * Shape: micro-batch rows are (seq, bit) with seq globally ordered by
  * the source (the monitoring contract; order inside a batch is
  * recovered by sorting on seq). State is ≤ 2·log₂W + 2 buckets.
  *
  * Exactly-once: batch-id high-water mark, state published only after
  * the whole batch folds (the house foreachBatch retry contract).
  */
object DgimStream {

  /** The DGIM transition as a PURE fold — the single Scala source of
    * truth shared by the global [[DgimStore]] and the keyed
    * [[KeyedDgimStream]] state update, certified against the batch SQL
    * (`DgimOps.dgimFoldSql`) by DgimStreamSpec. State = (clock,
    * buckets newest-first as (size, time)). */
  private[streaming] def foldBits(w: Int, t0: Long,
      b0: Vector[(Long, Long)], bits: Iterable[Long])
      : (Long, Vector[(Long, Long)]) = {
    var wt = t0
    var wb = b0
    bits.foreach { bit =>
      wt += 1
      wb = wb.filter(_._2 > wt - w)
      if (bit == 1L) {
        wb = (1L, wt) +: wb
        // cascade: merge the two OLDEST of the first size with three
        // buckets (sizes are ordered newest-first, equals adjacent)
        var done = false
        while (!done) {
          (0 until wb.length - 2).find(i => wb(i)._1 == wb(i + 2)._1) match {
            case Some(ix) =>
              val merged = (wb(ix + 1)._1 * 2, wb(ix + 1)._2)
              wb = (wb.take(ix + 1) :+ merged) ++ wb.drop(ix + 3)
            case None => done = true
          }
        }
      }
    }
    (wt, wb)
  }

  /** DGIM estimate: all full buckets + half the oldest. */
  private[streaming] def estimateOf(b: Vector[(Long, Long)]): Long =
    if (b.isEmpty) 0L
    else if (b.length == 1) b.head._1
    else b.init.map(_._1).sum + b.last._1 / 2

  /** The unconditional error certificate: ⌈oldest/2⌉. */
  private[streaming] def boundOf(b: Vector[(Long, Long)]): Long =
    if (b.isEmpty) 0L else (b.last._1 + 1) / 2

  /** Standing DGIM state over a window of `w` positions. */
  final class DgimStore(w: Int) {
    private var t = -1L
    private var buckets = Vector.empty[(Long, Long)] // (size, time) newest-first
    private var lastApplied = -1L

    /** Fold a batch of bits (already in stream order). */
    def merge(batchId: Long, bits: Seq[Long]): Unit = synchronized {
      if (batchId > lastApplied) {
        val (wt, wb) = foldBits(w, t, buckets, bits)
        // publish only after the full fold (retry contract)
        t = wt
        buckets = wb
        lastApplied = batchId
      }
    }

    /** DGIM estimate: all full buckets + half the oldest. */
    def estimate: Long = synchronized(estimateOf(buckets))

    /** The unconditional error certificate: ⌈oldest/2⌉. */
    def bound: Long = synchronized(boundOf(buckets))

    def snapshot: Vector[(Long, Long)] = synchronized(buckets)
    def time: Long = synchronized(t)
  }

  /** Maintain `store` from a streaming (seq, bit) frame. */
  def maintain(rows: DataFrame, store: DgimStore): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val collected = batch
          .select(col("seq").cast("long"), col("bit").cast("long"))
          .collect()
          .sortBy(_.getLong(0))
          .map(_.getLong(1)).toSeq
        store.merge(batchId, collected)
      }
      .start()
}
