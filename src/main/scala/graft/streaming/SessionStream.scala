package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — q19's stream twin: events arrive as
  * micro-batches per user and sessions close online as soon as a
  * 30-minute gap is observed, instead of waiting for a batch window
  * pass over the full history.
  *
  * Shape: `flatMapGroupsWithState` keyed by user; state is ONE open
  * session per user (id, start, last-seen, count, exact DECIMAL value
  * sum) — O(1) per user, the bounded-state contract the rest of the
  * streaming package follows. A batch's events are sorted (ts,
  * event_id) inside the group before folding, so intra-batch arrival
  * order is irrelevant; cross-batch order is the stream's time order
  * (the replay contract the spec exercises under two slicings).
  *
  * Determinism: the session fold is exactly q19's gap rule, and the
  * value sum is kept in the same DECIMAL(18,4) scale q19 casts
  * through, so a closed session emitted here is bit-identical to the
  * q19 row — the spec closes every session with per-user flush events
  * and checks set equality with the batch output.
  */
object SessionStream {

  val GapUs = 1800000000L // 30 min, q19's threshold

  final case class EventIn(user_id: Long, us: Long, event_id: Long, value: Double)

  final case class SessState(sessionId: Long, startUs: Long, lastUs: Long,
    n: Long, total: BigDecimal)

  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
    start_us: Long, end_us: Long, total_value: Double)

  private def dec4(v: Double): BigDecimal =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)

  /** Streaming frame (user_id, ts, event_id, value) → closed sessions.
    * The open session per user stays in state until a gap (or a flush
    * event past the gap) closes it. */
  def sessions(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"),
        col("event_id").cast("long"), coalesce(col("value"), lit(0.0)).as("value"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[SessState]) =>
          val evs = rows.toSeq.sortBy(e => (e.us, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st = state.getOption
          evs.foreach { e =>
            st match {
              case Some(s0) if e.us - s0.lastUs <= GapUs =>
                st = Some(s0.copy(lastUs = e.us, n = s0.n + 1,
                  total = s0.total + dec4(e.value)))
              case Some(s0) =>
                out += SessionOut(uid, s0.sessionId, s0.n, s0.startUs, s0.lastUs,
                  s0.total.toDouble)
                st = Some(SessState(s0.sessionId + 1, e.us, e.us, 1L, dec4(e.value)))
              case None =>
                st = Some(SessState(1L, e.us, e.us, 1L, dec4(e.value)))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
