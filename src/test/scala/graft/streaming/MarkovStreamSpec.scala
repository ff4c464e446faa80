package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming Markov chain: replaying the events table as time-ordered
  * micro-batches must reproduce the batch lead()-window transition
  * counts EXACTLY under two slicings — including every transition that
  * spans a batch boundary (the per-user bridge state). */
class MarkovStreamSpec extends SparkTestBase {

  private def eventsSorted: Array[(Long, Long, Long, String)] =
    graft.ops.EventOps.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id",
        "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(r => (r._2, r._3)) // global time order => per-user order

  private def batchCounts(rows: Array[(Long, Long, Long, String)])
      : Map[(String, String), Long] =
    rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val seq = rs.sortBy(r => (r._2, r._3)).map(_._4)
      seq.zip(seq.drop(1))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def replay(rows: Array[(Long, Long, Long, String)],
                     batchSize: Int): Map[(String, String), Long] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val store = new MarkovStream.TransStore
    val q = MarkovStream.maintain(
      input.toDF().toDF("user_id", "ts_us", "event_id", "event_type"), store)
    try {
      rows.grouped(batchSize).foreach { slice =>
        input.addData(slice.toSeq)
        q.processAllAvailable()
      }
      store.snapshot
    } finally q.stop()
  }

  test("stream ≡ batch: transition counts match under two slicings") {
    val rows = eventsSorted
    val expected = batchCounts(rows)
    assert(expected.values.sum == rows.length - rows.map(_._1).distinct.length,
      "every event but each user's first yields one transition")
    for (slice <- Seq(23, 311)) {
      val streamed = replay(rows, slice)
      assert(streamed == expected,
        s"streamed chain (slice $slice) diverges from batch lead() counts")
    }
  }

  test("bridge transitions span batch boundaries (single-row slices)") {
    // one user, five events, one event per micro-batch: every transition
    // is a bridge — the pure cross-batch path
    val rows = Array(
      (7L, 1L, 1L, "view"), (7L, 2L, 2L, "click"), (7L, 3L, 3L, "view"),
      (7L, 4L, 4L, "purchase"), (7L, 5L, 5L, "view"))
    val streamed = replay(rows, 1)
    assert(streamed == Map(
      ("view", "click") -> 1L, ("click", "view") -> 1L,
      ("view", "purchase") -> 1L, ("purchase", "view") -> 1L))
  }
}
