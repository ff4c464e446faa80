package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.Aggregators.{QSketchBuf, QuantileSketch}

/** Streaming mergeable quantile sketch — the online twin of q490's KLL
  * audit leg (`ops/QuantileSelOps`), the 14th streaming module. The
  * sketch IS the streaming-native quantile answer: each micro-batch
  * folds DISTRIBUTED into one constant-size `QSketchBuf` delta
  * (per-partition mutable folds + a left fold over the ≤32 partials),
  * and the driver store merges the delta into the standing buffer with
  * the SAME `merge` the batch Aggregator registers.
  *
  * Equivalence contract: a KLL buffer's CONTENTS depend on the merge
  * tree, so unlike F2Stream/SketchStream the stream cannot promise
  * bit-equal state across slicings. What it promises — and the spec
  * asserts — is exactly what the sketch itself certifies: `n` is exact,
  * `err` is an exact upper bound on rank drift for THIS merge history,
  * and every quantile read-out sits within err + maxW true ranks of its
  * target under ANY slicing (q490's certified-bracket idiom). Same
  * slicing → bit-identical state (the sketch is derandomized; there is
  * no coin to flip).
  *
  * Exactly-once: foreachBatch redeliveries are skipped by batch-id
  * high-water mark (monotone per query), O(1) state.
  */
object QuantileStream {

  private val K = 256 // q490's sketch capacity

  /** The standing sketch + batch-id high-water mark. */
  final class QuantileStore {
    private var buf = QuantileSketch.k256.zero
    private var lastApplied = -1L

    def merge(batchId: Long, delta: QSketchBuf): Unit = synchronized {
      if (batchId > lastApplied) {
        lastApplied = batchId
        buf = QuantileSketch.k256.merge(buf, delta)
      }
    }

    def snapshot: QSketchBuf = synchronized(buf)
    def n: Long = synchronized(buf.n)

    /** (estimate, certified rank budget) for the phi-quantile of
      * everything merged so far. */
    def estimate(phi: Double): (Long, Long) = synchronized {
      val s = QuantileSketch.k256.finish(buf)
      val target = math.ceil(phi * s.n).toLong
      (QuantileSketch.query(s, target), s.err + s.maxW)
    }
  }

  /** Maintain `store` from a streaming single-column LONG frame `v`.
    * Each batch folds per-partition (the q490 treeAggregate shape, the
    * partial never leaves one partition) and merges the ≤|partitions|
    * partials in partition order — deterministic for a fixed slicing. */
  def maintain(values: DataFrame, store: QuantileStore): StreamingQuery =
    values.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import batch.sparkSession.implicits._
        val partials = batch.select(col("v").cast("long")).as[Long].rdd
          .mapPartitions(it =>
            if (it.isEmpty) Iterator.empty
            else Iterator.single(QuantileSketch.foldPartition(it, K)))
          .collect()
        if (partials.nonEmpty) {
          val delta = partials.reduceLeft(QuantileSketch.k256.merge)
          store.merge(batchId, delta)
        }
      }
      .start()
}
