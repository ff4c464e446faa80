package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming Elo rating maintenance — the online twin of q547's batch
  * fold (`ops/RatingOps`), the 16th streaming module. Elo IS an online
  * algorithm: the state is one rating per entity, and folding a day's
  * round-robin results applies EXACTLY the batch recurrence (per-day
  * batch update from PRE-day ratings, each step quantized round(·,9)) —
  * so as long as day rows arrive in day order (the monitoring contract;
  * order inside a batch is recovered by sorting), stream ≡ batch
  * BIT-FOR-BIT under any slicing: like KalmanStream the recurrence has
  * no reassociation freedom, the per-day j-sum is evaluated in the same
  * fixed order as the batch fold.
  *
  * Shape: micro-batch rows are already day-aggregated (one row per day
  * carrying the 5 exact cent totals — model-sized by the calendar);
  * state is 5 doubles.
  *
  * Exactly-once: batch-id high-water mark (the house foreachBatch retry
  * contract).
  */
object EloStream {

  private val K = 32.0

  /** Standing ratings over `n` entities (indices 0..n-1). */
  final class EloStore(n: Int) {
    private val r = Array.fill(n)(1500.0)
    private var lastApplied = -1L
    private var days = 0L

    /** Fold a batch of (day, cents[n]) rows — day-ordered (sorted here). */
    def merge(batchId: Long, rows: Seq[(String, Array[Long])]): Unit =
      synchronized {
        if (batchId > lastApplied) {
          // fold into scratch copies and publish (ratings, day count,
          // high-water mark) only after the whole fold completes: if any
          // row throws mid-batch the store is untouched and NOT marked
          // applied, so the foreachBatch retry re-runs the batch — the
          // same merge ordering every other streaming store uses
          val work = r.clone()
          var newDays = days
          rows.sortBy(_._1).foreach { case (_, cs) =>
            newDays += 1
            val pre = work.clone()
            var i = 0
            while (i < work.length) {
              // identical evaluation order to q547's codegen fold: the
              // j-terms accumulate ascending, each (S − E) subtracted
              // before adding to the accumulator
              var acc = 0.0
              var j = 0
              while (j < work.length) {
                if (j != i) {
                  val s =
                    if (cs(i) > cs(j)) 1.0
                    else if (cs(i) < cs(j)) 0.0 else 0.5
                  val e = 1.0 / (1.0 +
                    math.pow(10.0, (pre(j) - pre(i)) / 400.0))
                  acc += s - e
                }
                j += 1
              }
              work(i) = BigDecimal(pre(i) + K * acc)
                .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
              i += 1
            }
          }
          System.arraycopy(work, 0, r, 0, r.length)
          days = newDays
          lastApplied = batchId
        }
      }

    def snapshot: Array[Double] = synchronized(r.clone())
    def nDays: Long = synchronized(days)
  }

  /** Maintain `store` from a streaming (day, c0..c{n-1}) frame. */
  def maintain(rows: DataFrame, store: EloStore, n: Int): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cols = col("day").cast("string") +:
          (0 until n).map(i => col(s"c$i").cast("long"))
        val collected = batch.select(cols: _*).collect()
          .map(r => (r.getString(0),
            Array.tabulate(n)(i => r.getLong(i + 1)))).toSeq
        store.merge(batchId, collected)
      }
      .start()
}
