package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q475 semantics: the bounded-state Aggregator plan must equal the
  * window row_number plan row-for-row (the SkewBench sf10 checksum
  * claim, asserted exactly at test SF), and its physical plan must be
  * an aggregation, not a window sort. */
class TopKOpsSpec extends SparkTestBase {

  test("q475: typed top-k aggregator equals the window plan exactly") {
    val agg = TopKOps.q475TopkPerUser.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val win = EventOps.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))))
      .filter(col("rk") <= 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3).toLong) -> (r.getLong(2), r.getLong(1))).toMap
    assert(agg == win, "aggregator top-k diverges from the window plan")
    assert(agg.nonEmpty && agg.keys.map(_._1).toSet.size > 10)
  }

  test("q475 plan: no Window operator — the whole point is bounded agg state") {
    val plan = TopKOps.q475TopkPerUser.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "q475 must not plan a window sort")
    assert(plan.contains("Aggregate"), "q475 must plan as an aggregation")
  }
}
