package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming KMV distinct-count sketch — the online form of q358's
  * audit and the production path its Scaladoc promises: COUNT(DISTINCT)
  * over an unbounded stream with O(k) state per group.
  *
  * Shape: the hash projection is stateless (identical to q358's batch
  * projection, column for column); the per-group sketch is a
  * `mapGroupsWithState` fold whose state is the sorted array of the k
  * smallest distinct hashes seen — KMV's whole point is that this
  * bounded set IS the sufficient statistic. State size ≤ k longs per
  * group, independent of stream length (the bounded-state contract
  * QualityStream/HeavyHitterStream follow).
  *
  * Determinism: the k-minimum set is a commutative, idempotent merge
  * (set-union then take-k-smallest), so unlike Misra–Gries there is no
  * slicing sensitivity AT ALL: stream ≡ batch exactly, under any
  * micro-batch slicing and any within-batch order — the spec replays
  * two slicings and checks the final emissions equal q358's batch
  * output hash for hash.
  */
object SketchStream {

  val K = 32

  /** Sorted ascending, distinct, length ≤ K. */
  final case class KmvState(hashes: Array[Long])

  final case class KmvEmit(event_type: String, n_kept: Int, kth_hash: Long,
    est_kmv: Double)

  /** q358's hash projection, stateless — usable on batch or stream. */
  def hashed(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("u"))

  /** Merge new hashes into the k-minimum set. */
  private[streaming] def merge(state: Array[Long], incoming: Iterator[Long]): Array[Long] = {
    val set = scala.collection.mutable.SortedSet.empty[Long]
    set ++= state
    incoming.foreach { u =>
      if (set.size < K) set += u
      else if (u < set.last && !set.contains(u)) { set += u; set -= set.last }
    }
    set.toArray
  }

  /** q358's estimator over a k-minimum set. */
  private[streaming] def estimate(hashes: Array[Long]): Double =
    if (hashes.length < K) hashes.length.toDouble
    else BigDecimal((K - 1).toDouble * 1152921504606846976.0 / hashes.last.toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble // q358's round(·,4)

  /** The stateful per-type sketch over a streaming events frame
    * (event_type, user_id). Emits the updated sketch row each batch. */
  def sketch(events: DataFrame): Dataset[KmvEmit] = {
    val spark = events.sparkSession
    import spark.implicits._
    hashed(events)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[KmvState, KmvEmit](GroupStateTimeout.NoTimeout) {
        case (tpe, rows, state: GroupState[KmvState]) =>
          val merged = merge(state.getOption.map(_.hashes).getOrElse(Array.empty),
            rows.map(_._2))
          state.update(KmvState(merged))
          KmvEmit(tpe, merged.length,
            if (merged.isEmpty) 0L else merged.last, estimate(merged))
      }
  }
}
