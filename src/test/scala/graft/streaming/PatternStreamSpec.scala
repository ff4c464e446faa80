package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming CEP matcher: replaying the event corpus in event-time order
  * as micro-batches must reproduce q154's batch regex verdicts exactly —
  * counts AND per-user decisions — under two different slicings. */
class PatternStreamSpec extends SparkTestBase {

  private def eventsSorted: Array[(Long, Long, Long, String)] =
    graft.ops.EventOps.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), substring(col("event_type"), 1, 1).as("letter"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(r => (r._2, r._3)) // event-time arrival order (the contract)

  private def replay(ev: Array[(Long, Long, Long, String)], batchSize: Int,
                     name: String): Map[Long, (Boolean, Boolean, Boolean)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = PatternStream.matcher(
        input.toDF().toDF("user_id", "ts_us", "event_id", "letter"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      ev.grouped(batchSize).foreach { slice =>
        input.addData(slice.toSeq)
        q.processAllAvailable()
      }
      spark.table(name).collect()
        .map(r => (r.getAs[Long]("userId"), r.getAs[Long]("version"),
          (r.getAs[Boolean]("browseBuy"), r.getAs[Boolean]("endsInError"),
           r.getAs[Boolean]("signupFirst"))))
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2)._3 }
        .toMap
    } finally q.stop()
  }

  test("stream ≡ batch: NFA verdicts equal q154's regex verdicts under two slicings") {
    val ev = eventsSorted
    assert(ev.length >= 1000)

    // per-user batch truth, via the same path+regex q154 aggregates
    val truth = graft.ops.EventOps.events(spark, sfDir)
      .withColumn("letter", substring(col("event_type"), 1, 1))
      .groupBy(col("user_id"))
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(ts, event_id, letter))), x -> x.letter)"),
        "").as("path"))
      .select(col("user_id"), col("path").rlike("v.*p").as("bb"),
        col("path").rlike("e[^p]*$").as("ee"), col("path").rlike("^s").as("sf"))
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
      .toMap

    for (slice <- Seq(311, 97)) {
      val streamed = replay(ev, slice, s"cep$slice")
      assert(streamed == truth, s"NFA verdicts (slice $slice) diverge from q154")
    }
    // the committed q154 report matches the rolled-up truth (sanity tie
    // to the oracle-checked row)
    val rep = graft.ops.ProductAnalytics.q154SequencePatterns.fn(spark, sfDir)
      .collect().head
    assert(rep.getAs[Long]("n_browse_buy") == truth.values.count(_._1).toLong)
    assert(rep.getAs[Long]("n_end_in_error") == truth.values.count(_._2).toLong)
    assert(rep.getAs[Long]("n_signup_first") == truth.values.count(_._3).toLong)
    // all three patterns fire somewhere on the fixture
    assert(truth.values.exists(_._1) && truth.values.exists(_._2) &&
      truth.values.exists(_._3))
  }
}
