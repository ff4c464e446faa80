package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy-hitter tracking with BOUNDED state — Misra–Gries
  * summaries (the deterministic frequent-items sketch behind every
  * "trending tokens" dashboard): per hash shard, at most `k` counters
  * survive however long the stream runs, and the classic guarantee
  * holds under ANY arrival order:
  *
  *   true_count − Σ_shards (N_shard / (k+1)) ≤ estimate ≤ true_count,
  *
  * so every token whose true count exceeds the summed decrement budget
  * is GUARANTEED present in the final summary. Unlike DedupStream's
  * min-owner state (order-determined but slicing-invariant) the MG
  * content IS order-sensitive — what is invariant is the ERROR BOUND,
  * and that is what the spec certifies against exact batch counts.
  *
  * Scale: tokens shard by hash (4 here; any number at scale), each
  * shard's state is one k-entry map — O(shards × k) total state; the
  * decrement budget is tracked per shard so the bound is computable
  * without a second pass.
  */
object HeavyHitterStream {

  final case class MgState(counters: Map[String, Long], decremented: Long,
    n: Long, version: Long = 0L)
  final case class MgRow(shard: Int, token: String, estimate: Long,
    shardN: Long, shardDecremented: Long, version: Long)

  val K = 32
  val Shards = 4

  /** One Misra–Gries update fold over an iterator of tokens. */
  def mgFold(init: MgState, tokens: Iterator[String], k: Int = K): MgState = {
    var counters = init.counters
    var dec = init.decremented
    var n = init.n
    tokens.foreach { t =>
      n += 1
      counters.get(t) match {
        case Some(c) => counters = counters.updated(t, c + 1)
        case None if counters.size < k => counters = counters.updated(t, 1L)
        case None =>
          // decrement all; drop zeros — the (k+1)-way cancellation step
          dec += 1
          counters = counters.flatMap { case (w, c) =>
            if (c > 1) Some(w -> (c - 1)) else None
          }
      }
    }
    MgState(counters, dec, n)
  }

  /** The stateful tracker over a streaming (token) frame: tokens shard
    * by xxhash64 % Shards; each shard folds its micro-batch through MG
    * and re-emits its full summary every batch under Append, keyed by a
    * per-shard monotone `version` (one per fold): consumers select the
    * max-version rows per shard to read the latest summary
    * deterministically — no reliance on sink ordering or on shardN
    * happening to be monotone. */
  def track(tokens: DataFrame): Dataset[MgRow] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col("token"),
        pmod(xxhash64(col("token")), lit(Shards.toLong)).cast("int").as("shard"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[MgState, MgRow](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, rows, state: GroupState[MgState]) =>
          val prev = state.getOption.getOrElse(MgState(Map.empty, 0L, 0L))
          // fold in deterministic (token) order within the batch so tests
          // are reproducible; the GUARANTEE needs no order at all
          val folded = mgFold(prev, rows.map(_._1).toSeq.sorted.iterator)
          val next = folded.copy(version = prev.version + 1)
          state.update(next)
          next.counters.iterator.map { case (t, c) =>
            MgRow(shard, t, c, next.n, next.decremented, next.version)
          }
      }
  }

  /** Exact batch counts — what the MG bound is certified against. */
  def exactCounts(tokens: DataFrame): DataFrame =
    tokens.groupBy(col("token")).agg(count(lit(1)).as("n"))
}
