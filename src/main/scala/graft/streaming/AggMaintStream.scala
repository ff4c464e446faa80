package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.DecimalType

/** Streaming incremental aggregate maintenance — the online twin of
  * q113's materialized-view refresh (`ops/ScaleOps.q113IncrementalAgg`),
  * closing the one continuous-ingestion pattern of the pipeline surface
  * that had no online half (dedup, drift, sessionization and the sketches
  * all have one; r9 verdict #5).
  *
  * Shape: each micro-batch is folded DISTRIBUTED into the same per-key
  * partials q113 uses — (count, DECIMAL(18,4) sum) per order priority —
  * and the model-sized partial rows (one per key) are merged exactly into
  * the stored view. Because the merge is associative and exact (long
  * adds + BigDecimal adds, no floats until the final read-out), the view
  * after ANY micro-batch slicing equals q113's full recompute over the
  * same rows — the invariant AggMaintStreamSpec proves under two
  * slicings, mirroring q113's own batch oracle (incremental ≡ full).
  *
  * Scale: the stream side is one map-side-combined hash aggregation per
  * micro-batch (O(delta) work, O(keys) output); the stored view is a few
  * rows per key, so the driver-side merge is O(keys), not O(stream) —
  * the same claim q113's Scaladoc makes for the batch refresh. In a
  * cluster deployment the store is a MERGE INTO against the view table;
  * the partial-fold + exact-merge algebra is identical.
  *
  * Exactly-once: `foreachBatch` may re-deliver a batch id after a
  * failure/retry; the store records applied ids and re-applies nothing —
  * the idempotent-sink discipline of `sources/Sources.scala`.
  */
object AggMaintStream {

  private val M = DecimalType(18, 4)

  /** The stored view: per-priority (count, exact decimal sum) partials.
    * Thread-safe; merges are idempotent per batch id. */
  final class ViewStore {
    private val partials =
      scala.collection.mutable.Map[String, (Long, java.math.BigDecimal)]()
    // batch ids are monotonically increasing per query: a high-water mark
    // gives the same retry idempotence in O(1) state (an applied-SET
    // would grow forever on an unbounded stream — SampleStream's r11 fix)
    private var lastApplied = -1L

    /** Merge one micro-batch's partial rows; a batch id at/below the
      * high-water mark is skipped (exactly-once under foreachBatch
      * retries). */
    def merge(batchId: Long,
              rows: Seq[(String, Long, java.math.BigDecimal)]): Unit =
      synchronized {
        if (batchId > lastApplied) {
          lastApplied = batchId
          rows.foreach { case (key, pn, pv) =>
            val (n0, v0) = partials.getOrElse(
              key, (0L, java.math.BigDecimal.ZERO))
            partials(key) = (n0 + pn, v0.add(pv))
          }
        }
      }

    /** q113's read-out shape: (priority, n_orders, revenue as double). */
    def snapshot: Map[String, (Long, Double)] = synchronized {
      partials.view.mapValues { case (n, v) => (n, v.doubleValue) }.toMap
    }
  }

  /** The per-slice partial fold — the SAME projection q113 applies to its
    * delta partition: count + exact DECIMAL(18,4) sum per priority. */
  def partials(orders: DataFrame): DataFrame = orders
    .groupBy(col("o_orderpriority"))
    .agg(count(lit(1)).as("pn"),
         sum(col("o_totalprice").cast(M)).as("pv"))

  /** Maintain `store` from a streaming orders frame
    * (o_orderpriority, o_totalprice): one distributed partial fold per
    * micro-batch, then an O(keys) exact merge. */
  def maintain(orders: DataFrame, store: ViewStore): StreamingQuery =
    orders.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = partials(batch).collect().map { r =>
          (r.getString(0), r.getLong(1), r.getDecimal(2))
        }.toSeq
        store.merge(batchId, rows)
      }
      .start()
}
