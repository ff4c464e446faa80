package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming AMS "tug-of-war" F2 sketch — the online twin of q483's
  * batch estimator (`ops/FreqMomentOps.q483AmsF2`), the 12th streaming
  * module. F2 = Σ_k f_k² is THE shuffle-size/self-join-size signal, and
  * the AMS counters are where the sketch family is at its purest: the
  * whole state is 64 signed BIGINT counters t_j = Σ_k f_k·s_j(k), and a
  * row with key k folds in as t_j += s_j(k) — addition, so the fold is
  * commutative, associative and EXACT. Stream ≡ batch holds counter for
  * counter under ANY micro-batch slicing and any within-batch order
  * (stronger than Misra–Gries's slicing-sensitive emissions; same class
  * as SketchStream's KMV).
  *
  * Shape: each micro-batch fans its rows out to the 64 estimators and
  * hash-aggregates to per-j deltas DISTRIBUTED (64-row output, map-side
  * combined — O(delta) work); the driver store adds the 64 deltas into
  * the standing counters. Estimates read out with q483's exact
  * median-of-means spelling: 8 groups of 8, m_g = Σ t_j²/8, estimate =
  * (m[4]+m[5])/2 over the sorted means.
  *
  * Exactly-once: batch ids are monotone per query — a high-water mark
  * skips foreachBatch redeliveries in O(1) state.
  */
object F2Stream {

  val R = 64 // estimators (q483's R)
  val G = 8  // median-of-means groups (q483's G)

  /** The standing sketch: 64 BIGINT counters + the row count. */
  final class F2Store {
    private val t = Array.fill(R)(0L)
    private var rows = 0L
    private var lastApplied = -1L

    def merge(batchId: Long, deltas: Seq[(Int, Long)], nRows: Long): Unit =
      synchronized {
        if (batchId > lastApplied) {
          lastApplied = batchId
          deltas.foreach { case (j, d) => t(j) += d }
          rows += nRows
        }
      }

    def counters: Seq[Long] = synchronized(t.toSeq)
    def n: Long = synchronized(rows)

    /** q483's median-of-means estimate over the standing counters. */
    def estimate: Double = synchronized {
      val means = t.grouped(R / G)
        .map(g => g.map(x => x * x).sum / (R / G).toDouble).toSeq.sorted
      (means(G / 2 - 1) + means(G / 2)) / 2.0
    }
  }

  /** q483's sign convention, row-level: one hex digit of md5(k|j). The
    * SAME expression q483 applies to its key-frequency frame — here each
    * raw row contributes its sign once, so Σ_rows sgn = Σ_k f_k·sgn. */
  def signedDeltas(keys: DataFrame): DataFrame = keys
    .select(col("k").cast("string").as("ks"))
    .select(col("ks"), explode(sequence(lit(0), lit(R - 1))).as("j"))
    .withColumn("sgn",
      lit(1L) - lit(2L) * pmod(
        conv(substring(md5(concat_ws("|", col("ks"),
          col("j").cast("string"))), 1, 1), 16, 10).cast("long"), lit(2L)))
    .groupBy(col("j"))
    .agg(sum(col("sgn")).as("d"), count(lit(1)).as("nr"))

  /** Maintain `store` from a streaming single-column key frame `k`. */
  def maintain(keys: DataFrame, store: F2Store): StreamingQuery =
    keys.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = signedDeltas(batch).collect()
        val deltas = rows.map(r => (r.getAs[Int]("j"), r.getAs[Long]("d"))).toSeq
        val nRows = if (rows.isEmpty) 0L else rows.head.getAs[Long]("nr")
        store.merge(batchId, deltas, nRows)
      }
      .start()
}
