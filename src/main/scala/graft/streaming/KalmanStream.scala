package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming local-level Kalman filter — the online twin of q514's
  * batch fold (`ops/KalmanOps`), the 15th streaming module. The filter
  * IS an online algorithm: its state per series is two doubles
  * (level, P), and folding a new day into the standing state applies
  * EXACTLY the recurrence the batch query applies — so as long as each
  * series' observations arrive in day order (the monitoring contract:
  * upstream emits one aggregate row per closed day), stream ≡ batch
  * BIT-FOR-BIT under any batch slicing. No other module gets so strong
  * an equivalence so cheaply: the recurrence has no reassociation
  * freedom to begin with (q514's argument), so slicing cannot perturb
  * it.
  *
  * Shape: the micro-batch frame is already day-aggregated (one row per
  * (series, day) — model-sized by the calendar), so the driver fold
  * touches a handful of rows per batch; state is |series| × 4 numbers.
  *
  * Exactly-once: batch-id high-water mark (the house foreachBatch
  * retry contract).
  */
object KalmanStream {

  private val Q  = 0.1  // q514's process noise
  private val Rn = 10.0 // q514's observation noise

  final case class KState(lvl: Double, p: Double, k: Double, n: Long)

  /** Standing per-series filter state. */
  final class KalmanStore {
    private val st = scala.collection.mutable.Map.empty[String, KState]
    private var lastApplied = -1L

    /** Fold a batch of (series, day, z) rows — MUST be day-ordered per
      * series within the batch (enforced by sorting here). */
    def merge(batchId: Long, rows: Seq[(String, String, Long)]): Unit =
      synchronized {
        if (batchId > lastApplied) {
          lastApplied = batchId
          rows.sortBy(r => (r._1, r._2)).foreach { case (cls, _, z) =>
            st.get(cls) match {
              case None =>
                st(cls) = KState(z.toDouble, Rn, 0.0, 1L)
              case Some(KState(lvl, p, _, n)) =>
                val ppred = p + Q
                val k = ppred / (ppred + Rn)
                st(cls) = KState(lvl + k * (z.toDouble - lvl),
                  (1.0 - k) * ppred, k, n + 1)
            }
          }
        }
      }

    def snapshot: Map[String, KState] = synchronized(st.toMap)
  }

  /** Maintain `store` from a streaming (cls, day, z) frame. */
  def maintain(rows: DataFrame, store: KalmanStore): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val collected = batch
          .select(col("cls"), col("day"), col("z").cast("long"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        store.merge(batchId, collected)
      }
      .start()
}
