package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}

/** Streaming transition-count maintenance — the online twin of q496's
  * Markov transition matrix (`ops/MarkovChainOps`): keep per-(cur,nxt)
  * transition counts of an UNBOUNDED event stream current, so the
  * stationary-distribution / drift dashboards always have a fresh chain
  * without rescanning the log.
  *
  * This is the module family's first CROSS-BATCH-STATEFUL twin: unlike
  * the additive folds (F2Stream, SketchStream) a transition can SPAN a
  * micro-batch boundary — user U's last event of batch k and first
  * event of batch k+1 form a pair no single batch contains. The bridge
  * is per-user keyed state (`flatMapGroupsWithState`): state = the last
  * (ts, event_id, type) seen per user, each batch emits its in-batch
  * transitions plus the bridge from the stored last event, then
  * advances the state. Spark shuffles by user and checkpoints the state
  * — the same mechanics that scale this to 10⁹ users on a cluster.
  *
  * Stream ≡ batch: counts after replay equal q496's lead()-window
  * counts over all rows seen, PROVIDED micro-batches respect per-user
  * event-time order (the append-only event-log ingestion contract:
  * slices arrive in time order; WITHIN a batch order is recovered by
  * sorting on (ts, event_id) — MarkovStreamSpec proves equality under
  * two different time-ordered slicings). Out-of-order delivery needs
  * the watermark/late-data machinery, which is EventStream's lane.
  *
  * Exactly-once: the downstream count fold is additive, so replays
  * would double-count; foreachBatch applies each batch id once past a
  * high-water mark (batch ids are monotone per query — the
  * SampleStream discipline).
  */
object MarkovStream {

  final case class Ev(userId: Long, tsUs: Long, eventId: Long,
                      eventType: String)
  final case class LastEv(tsUs: Long, eventId: Long, eventType: String)
  final case class Pair(cur: String, nxt: String)

  /** The maintained chain: (cur,nxt) → count, replay-deduped. */
  final class TransStore {
    private val counts = mutable.Map.empty[(String, String), Long]
    private var lastApplied = -1L

    def merge(batchId: Long, rows: Seq[((String, String), Long)]): Unit =
      synchronized {
        if (batchId > lastApplied) {
          lastApplied = batchId
          rows.foreach { case (k, n) =>
            counts.update(k, counts.getOrElse(k, 0L) + n)
          }
        }
      }

    /** q496's transition-count shape. */
    def snapshot: Map[(String, String), Long] = synchronized(counts.toMap)
  }

  /** One user's batch step: emit the bridge transition from the stored
    * last event (if any) plus all in-batch consecutive pairs; advance
    * the state to the batch's last event. */
  def stepUser(rows: Iterator[Ev], state: GroupState[LastEv]): Iterator[Pair] = {
    val sorted = rows.toVector.sortBy(e => (e.tsUs, e.eventId))
    if (sorted.isEmpty) Iterator.empty
    else {
      val types = sorted.map(_.eventType)
      val withBridge = state.getOption match {
        case Some(last) => last.eventType +: types
        case None       => types
      }
      val tail = sorted.last
      state.update(LastEv(tail.tsUs, tail.eventId, tail.eventType))
      withBridge.zip(withBridge.drop(1)).iterator
        .map { case (c, n) => Pair(c, n) }
    }
  }

  /** Per-user stateful transition extraction over a streaming frame with
    * columns (user_id, ts_us, event_id, event_type). */
  def transitions(events: DataFrame): Dataset[Pair] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "ts_us", "event_id", "event_type")
      .as[(Long, Long, Long, String)]
      .map { case (u, t, i, e) => Ev(u, t, i, e) }
      .groupByKey(_.userId)
      .flatMapGroupsWithState[LastEv, Pair](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (_, rows, state) => stepUser(rows, state)
      }
  }

  /** Maintain `store` from a streaming events frame. */
  def maintain(events: DataFrame, store: TransStore): StreamingQuery =
    transitions(events).writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Pair], batchId: Long) =>
        // distributed per-batch partial count; ≤|types|² rows reach the
        // driver regardless of batch size
        val counted = batch.groupBy("cur", "nxt").count().collect()
          .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSeq
        store.merge(batchId, counted)
      }
      .start()
}
