package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence-pattern matching — the online form of q154's
  * MATCH_RECOGNIZE-family path queries
  * (`ops/ProductAnalytics.q154SequencePatterns`), closing the CEP
  * family's missing online half (dedup, drift, sessionization, sketches
  * and incremental aggregation all have one).
  *
  * The batch operator regex-scans each user's FULL path string
  * ('v.*p', 'e[^p]*$', '^s'); the stream compiles those patterns into
  * O(1) NFA state per user — three booleans and a first-letter — so an
  * unbounded stream never stores a path:
  *
  *   - browse-buy  ('v.*p'):   seenV latches on 'v'; a later 'p' accepts
  *   - ends-in-error ('e[^p]*$'): latches on 'e', cleared ONLY by 'p' —
  *     true iff the last error is never followed by a purchase
  *   - signup-first ('^s'):    decided by the first event alone
  *
  * Determinism / stream ≡ batch: like DriftStream, the fold is
  * order-sensitive, so each micro-batch folds in (ts, event_id) order
  * and batches must arrive in event-time order (the replay contract the
  * spec exercises under two slicings); under it the latest emission per
  * user equals the batch regex verdicts exactly. Emissions carry a
  * per-user monotone `version` (the HeavyHitterStream convention):
  * consumers select max-version rows, never trusting sink order.
  */
object PatternStream {

  final case class NfaState(first: String, seenV: Boolean,
    browseBuy: Boolean, openError: Boolean, version: Long)

  final case class PatternRow(userId: Long, browseBuy: Boolean,
    endsInError: Boolean, signupFirst: Boolean, version: Long)

  /** One NFA step per letter (the compiled form of q154's three regexes). */
  def step(st: NfaState, letter: String): NfaState = {
    val first = if (st.first.isEmpty) letter else st.first
    val seenV = st.seenV || letter == "v"
    val browseBuy = st.browseBuy || (letter == "p" && st.seenV)
    val openError =
      if (letter == "p") false
      else st.openError || letter == "e"
    NfaState(first, seenV, browseBuy, openError, st.version)
  }

  /** The stateful matcher over a streaming (user_id, ts_us, event_id,
    * letter) frame; emits each user's current verdicts every batch. */
  def matcher(events: DataFrame): Dataset[PatternRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("ts_us").cast("long"),
        col("event_id").cast("long"), col("letter").cast("string"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[NfaState, PatternRow](GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[NfaState]) =>
          val prev = state.getOption.getOrElse(
            NfaState("", seenV = false, browseBuy = false,
              openError = false, 0L))
          // order-sensitive fold: (ts, event_id) within the batch
          val folded = rows.toSeq.sortBy(r => (r._2, r._3))
            .foldLeft(prev)((st, r) => step(st, r._4))
          val next = folded.copy(version = prev.version + 1)
          state.update(next)
          PatternRow(user, next.browseBuy, next.openError,
            next.first == "s", next.version)
      }
  }

  /** Roll the latest per-user verdicts up to q154's report shape. */
  def report(latest: DataFrame): DataFrame =
    latest.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("browseBuy"), 1L).otherwise(0L)).as("n_browse_buy"),
      sum(when(col("endsInError"), 1L).otherwise(0L)).as("n_end_in_error"),
      sum(when(col("signupFirst"), 1L).otherwise(0L)).as("n_signup_first"))
}
