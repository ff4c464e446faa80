package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming weighted reservoir — the online twin of q112's
  * Efraimidis–Spirakis weighted sample (`ops/Reshape.q112WeightedSample`):
  * maintain the size-50 weight-proportional sample of an UNBOUNDED
  * document stream so a training-mix monitor always has a current,
  * reproducible sample without rescanning the corpus.
  *
  * Why stream ≡ batch is exact here: q112's sample is "top-k by
  * es_key = ln(u)/weight" with u a pure md5 hash of doc_id — no RNG
  * state, so the sample is a deterministic FUNCTION OF THE SET, and
  * top-k is an associative, order-insensitive fold: top-k(A ∪ B) =
  * top-k(top-k(A) ∪ top-k(B)). Each micro-batch therefore reduces
  * distributed to its own top-50 (one TakeOrdered per slice, O(delta)
  * work, ≤50 rows out) and the store keeps top-50 of the union — after
  * ANY slicing the reservoir equals q112 over all rows seen, the
  * invariant SampleStreamSpec proves under two slicings.
  *
  * Exactly-once: foreachBatch may redeliver a batch id; applied ids are
  * recorded and skipped (the idempotent-sink discipline of
  * `sources/Sources.scala`). A re-merge would be harmless here anyway —
  * top-k of a multiset ignores duplicates of already-kept rows — but the
  * contract stays uniform with the other foreachBatch sinks.
  */
object SampleStream {

  val K = 50 // reservoir size, q112's sample size

  final case class Kept(esKey: Double, docId: Long, lang: String,
                        source: String, nChars: Long)

  /** The maintained reservoir: top-K by (es_key desc, doc_id asc). */
  final class SampleStore {
    private var kept = Vector.empty[Kept]
    // batch ids are monotonically increasing per streaming query, so a
    // single high-water mark suffices for replay dedup — an applied-set
    // would grow without bound on a genuinely unbounded stream
    private var lastApplied = -1L

    def merge(batchId: Long, rows: Seq[Kept]): Unit = synchronized {
      if (batchId > lastApplied) {
        lastApplied = batchId
        kept = (kept ++ rows)
          .sortBy(k => (-k.esKey, k.docId))
          .take(K)
      }
    }

    /** q112's output shape, in sample order. */
    def snapshot: Seq[Kept] = synchronized(kept)
  }

  /** q112's deterministic Efraimidis–Spirakis key on a documents frame
    * (doc_id, lang, source, n_chars). */
  def withEsKey(docs: DataFrame): DataFrame = docs
    .withColumn("u",
      (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("double") + 1.0) / 1152921504606846976.0)
    .withColumn("es_key", log(col("u")) / col("n_chars"))

  /** One micro-batch's distributed reduction: its own top-K. */
  def sliceTopK(docs: DataFrame): DataFrame = withEsKey(docs)
    .orderBy(col("es_key").desc, col("doc_id").asc)
    .limit(K)
    .select(col("es_key"), col("doc_id"), col("lang"), col("source"),
      col("n_chars"))

  /** Maintain `store` from a streaming documents frame. */
  def maintain(docs: DataFrame, store: SampleStore): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = sliceTopK(batch).collect().map { r =>
          Kept(r.getDouble(0), r.getLong(1), r.getString(2),
            r.getString(3), r.getLong(4))
        }.toSeq
        store.merge(batchId, rows)
      }
      .start()
}
