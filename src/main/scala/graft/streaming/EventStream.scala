package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming window operators over an event stream with schema
  * (ts: timestamp, user_id: long, event_type: string, value: double) —
  * the streaming forms of EventOps' batch queries (SURVEY.md §2E:
  * tumbling/sliding/session windows, watermark + late-data policy).
  *
  * All take an unbounded DataFrame (readStream) but run identically on a
  * bounded one; watermarks bound state so a year-long stream holds only
  * `watermark / slide` windows per key in memory.
  */
object EventStream {

  private val M = DecimalType(18, 4)

  /** File-source stream over an events parquet path with the same ts-type
    * dispatch as [[graft.ops.EventOps.events]]: a stream needs its schema
    * upfront, so batch-infer it from the existing footers, then normalize
    * ts (long nanos or µs TIMESTAMP_NTZ, depending on the data generation)
    * to the session-UTC µs TimestampType every operator here expects. */
  def eventFileStream(s: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val raw = s.readStream.schema(schema).parquet(path)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Tumbling 1-hour counts/sums per event type; late rows beyond the
    * watermark are dropped (reference's clock-drift tolerance discussion,
    * doc/guide/Heartbeats.md). */
  def tumblingHourly(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(M)).cast("double").as("total_value"))

  /** Stream-static join: score a live event stream against a PRECOMPUTED
    * baseline table (the q129 hour-of-day mean/variance model) and gate
    * z > 3 anomalies as they arrive. The static side re-plans per
    * micro-batch but holds no streaming state — the model table is the
    * broadcast side, the stream is linear; exactly how a 100 TB batch
    * model serves a real-time scorer.
    */
  def anomalyGate(events: DataFrame, baseline: DataFrame): DataFrame =
    events.withColumn("hr", hour(col("ts")))
      .join(baseline, Seq("event_type", "hr"))
      .withColumn("z", (col("value") - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"),
              col("z"))

  /** Tumbling-window distinct users via HLL sketch — the 100 TB streaming
    * shape for cardinality: exact countDistinct keeps every user id in
    * state forever, while the sketch holds a fixed 16 KB per window and
    * merges associatively across triggers (HLL union is order-independent,
    * so the streaming estimate equals the batch estimate exactly).
    */
  def hourlyDistinctSketch(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14)))
        .as("approx_users"))

  /** Sliding window: 1-hour span every 15 minutes. */
  def slidingRate(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Session windows per user with a 30-minute inactivity gap — the
    * streaming equivalent of EventOps.q19Sessionize. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast(M)).cast("double").as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
              col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** Streaming exact dedup on (user_id, event_type) within the watermark
    * horizon — `dropDuplicates` keeps per-key state; the watermark bounds
    * it, so state size is O(distinct keys per horizon), not O(stream). */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Idempotent micro-batch sink: every batch overwrites a deterministic
    * batchId-keyed path, so a replayed batch (failure → retry) lands
    * byte-identical — the streaming form of the reference's
    * idempotent-handler contract (doc/guide/BasicGraphsHandlers.md
    * "Important!"). */
  def writeBatches(df: DataFrame, outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$id")
      }

  /** Stream-stream inner join: click-like events joined to view-like
    * events for the same user within ±10 minutes. Both sides carry
    * watermarks and the join condition bounds event time on BOTH sides, so
    * each side's buffered state is evictable — the only join shape that
    * runs unbounded-input-safe. */
  def streamStreamJoin(a: DataFrame, b: DataFrame,
                       watermark: String = "10 minutes"): DataFrame = {
    val left = a.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("a_ts"), col("event_type").as("a_type"))
    val right = b.withWatermark("ts", watermark)
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"), col("event_type").as("b_type"))
    left.join(right,
      col("user_id") === col("b_user") &&
        col("b_ts") >= col("a_ts") - expr("interval 10 minutes") &&
        col("b_ts") <= col("a_ts") + expr("interval 10 minutes"))
      .select(col("user_id"), col("a_ts"), col("a_type"), col("b_ts"), col("b_type"))
  }
}
