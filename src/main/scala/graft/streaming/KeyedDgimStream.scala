package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Keyed streaming DGIM — the 18th streaming module and the cluster
  * shape of `DgimStream`: "clicks in the last W events PER key" for a
  * monitor fleet, O(log² W) state per key inside
  * `mapGroupsWithState` instead of one global counter collected to the
  * driver. The transition is [[DgimStream.foldBits]], the SAME pure
  * fold the global store applies and DgimStreamSpec certifies against
  * q567's `DgimOps.dgimFoldSql` — one transition, three faces (batch
  * SQL, global store, keyed state).
  *
  * Contract: rows are (key, seq, bit) with `seq` the key's stream
  * position; order within a micro-batch is recovered by sorting on
  * seq, and batches must arrive in per-key stream order (the
  * monitoring contract, as DgimStream/DriftStream). State and emits
  * carry the full bucket list so a downstream certifier can check the
  * half-oldest certificate without trusting the estimator.
  *
  * Exactly-once: state lives in the streaming state store (checkpoint
  * + batch-id fencing is the engine's contract here, not a manual
  * high-water mark as in the foreachBatch modules).
  */
object KeyedDgimStream {

  /** Per-key DGIM state: stream clock + buckets newest-first, held as
    * parallel columns (encoder-friendly). */
  final case class KState(t: Long, sizes: Seq[Long], times: Seq[Long])

  /** Per-key readout after each micro-batch: the estimate, the
    * unconditional ⌈oldest/2⌉ certificate radius, and the bucket list
    * itself. */
  final case class KEmit(key: String, t: Long, est: Long, bound: Long,
                         sizes: Seq[Long], times: Seq[Long])

  /** Maintain one DGIM window of width `w` per key over a streaming
    * (key, seq, bit) frame; emits the per-key readout each batch. */
  def monitor(rows: DataFrame, w: Int): Dataset[KEmit] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("key").cast("string"), col("seq").cast("long"),
        col("bit").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[KState, KEmit](GroupStateTimeout.NoTimeout) {
        case (key, it, state: GroupState[KState]) =>
          val st = state.getOption.getOrElse(KState(-1L, Nil, Nil))
          val bits = it.toSeq.sortBy(_._2).map(_._3)
          val (t1, b1) = DgimStream.foldBits(w, st.t,
            st.sizes.zip(st.times).toVector, bits)
          state.update(KState(t1, b1.map(_._1), b1.map(_._2)))
          KEmit(key, t1, DgimStream.estimateOf(b1), DgimStream.boundOf(b1),
            b1.map(_._1), b1.map(_._2))
      }
  }
}
