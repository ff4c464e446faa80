package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming Page–Hinkley drift monitor — the online form of q457 and
  * the production shape its Scaladoc promises: the baseline (μ, the 5σ
  * threshold) is TRAINED OFFLINE on a reference window (q457's moment
  * pass), then the unbounded stream is monitored with O(1) state per
  * key: m += x − μ − δ, PH = m − min m, alarm when PH > λ.
  *
  * Determinism / stream ≡ batch: the PH recursion is a sequential fold
  * over the day index, so the state update sorts each micro-batch by
  * day and requires batches to arrive in event-time order (the replay
  * contract the spec exercises under two slicings); under that contract
  * the final (max_ph, argmax, first alarm) equal q457's batch output
  * exactly — same μ, same δ, same 6-dp PH rounding.
  */
object DriftStream {

  /** Exact prefix integers, so m is the same closed form q457 computes
    * (no error-accumulating += over thousands of days). */
  final case class PhState(cnt: Long, psum: Long, minM: Double,
    maxPh: Double, argmax: Long, firstAlarm: Long)

  final case class PhEmit(key: String, day: Long, ph: Double,
    max_ph: Double, argmax_day: Long, first_alarm_day: Long,
    alarmed: Boolean)

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Stateful monitor over (key, day, x) given the offline baseline.
    * Emits the running PH report per key each micro-batch. */
  def monitor(counts: DataFrame, mu: Double, delta: Double,
              threshold: Double): Dataset[PhEmit] = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts.select(col("key").cast("string"), col("day").cast("long"),
        col("x").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[PhState, PhEmit](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[PhState]) =>
          // minM starts at +inf: q457's window min is over m_1..m_t,
          // with no implicit 0 in the prefix
          var st = state.getOption.getOrElse(
            PhState(0L, 0L, Double.MaxValue, 0.0, -1L, -1L))
          var lastDay = -1L
          // the PH recursion is order-sensitive: fold in day order
          rows.toSeq.sortBy(x => (x._2, x._3)).foreach { case (_, day, x) =>
            val cnt = st.cnt + 1
            val psum = st.psum + x
            val m = psum - cnt * (mu + delta) // q457's closed form
            val minM = math.min(st.minM, m)
            val ph = r6(m - minM)
            val (maxPh, argmax) =
              if (ph > st.maxPh) (ph, day) else (st.maxPh, st.argmax)
            val firstAlarm =
              if (st.firstAlarm < 0 && ph > threshold) day else st.firstAlarm
            st = PhState(cnt, psum, minM, maxPh, argmax, firstAlarm)
            lastDay = day
          }
          state.update(st)
          PhEmit(key, lastDay,
            r6(st.psum - st.cnt * (mu + delta) - st.minM),
            st.maxPh, st.argmax, st.firstAlarm, st.firstAlarm >= 0)
      }
  }
}
