package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming sessionization ≡ q19 batch: feed the event history in time
  * order under two slicings, flush every user with a far-future event so
  * all real sessions close, and check the emitted set equals the batch
  * window computation row for row.
  */
class SessionStreamSpec extends SparkTestBase {

  test("closed stream sessions equal q19 batch sessions under two slicings") {
    val evs = graft.ops.EventOps.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), coalesce(col("value"), lit(0.0)).as("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._2, t._3))
    val flushUs = evs.map(_._2).max + 10L * SessionStream.GapUs
    val users = evs.map(_._1).distinct
    val feed = evs ++ users.map(u => (u, flushUs, -1L, 0.0))
    val expected = graft.ops.EventOps.q19Sessionize.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet

    for (slice <- Seq(1777, 4099)) {
      import spark.implicits._
      implicit val sc = spark.sqlContext
      val input = MemoryStream[(Long, Long, Long, Double)]
      val q = SessionStream.sessions(
          input.toDF().toDF("user_id", "us", "event_id", "value")
            .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
              col("event_id"), col("value")))
        .writeStream.format("memory").queryName(s"sess$slice")
        .outputMode(OutputMode.Append).start()
      try {
        feed.grouped(slice).foreach { s => input.addData(s.toSeq); q.processAllAvailable() }
        val got = spark.table(s"sess$slice").collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
            r.getAs[Long]("n_events"), r.getAs[Long]("start_us"),
            r.getAs[Long]("end_us"), r.getAs[Double]("total_value")))
          .filterNot(_._4 == flushUs) // drop the flush-only sessions
          .toSet
        assert(got == expected,
          s"slice $slice: ${got.size} streamed sessions != ${expected.size} batch; " +
            s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
      } finally q.stop()
    }
  }
}
