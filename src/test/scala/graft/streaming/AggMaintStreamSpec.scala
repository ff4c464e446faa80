package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental aggregate maintenance (r9 verdict #5): replaying
  * the orders table as micro-batches through the foreachBatch partial-fold
  * must reproduce q113's FULL recompute exactly — counts and the exact
  * decimal revenue — under two different micro-batch slicings, and the
  * merge must be idempotent per batch id (foreachBatch retry contract). */
class AggMaintStreamSpec extends SparkTestBase {

  private def ordersSorted: Array[(Long, String, Double)] =
    graft.ops.Tables(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)

  private def replay(rows: Array[(Long, String, Double)],
                     batchSize: Int): Map[String, (Long, Double)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val store = new AggMaintStream.ViewStore
    val q = AggMaintStream.maintain(
      input.toDF().toDF("o_orderpriority", "o_totalprice"), store)
    try {
      rows.grouped(batchSize).foreach { slice =>
        input.addData(slice.map(r => (r._2, r._3)).toSeq)
        q.processAllAvailable()
      }
      store.snapshot
    } finally q.stop()
  }

  test("stream ≡ batch: maintained view equals q113's full recompute " +
       "under two micro-batch slicings") {
    val rows = ordersSorted
    assert(rows.length > 1000, "orders fixture too small")

    // the full recompute — q113's oracle semantics on the same rows
    val full = AggMaintStream.partials(
        graft.ops.Tables(spark, sfDir).orders)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue))
      .toMap

    for (slice <- Seq(997, 256)) {
      val maintained = replay(rows, slice)
      assert(maintained == full,
        s"maintained view (slice $slice) diverges from the full recompute")
    }
    assert(full.size >= 3, "fixture has too few priorities to exercise keys")
  }

  test("merge is idempotent per batch id (foreachBatch retry contract)") {
    val store = new AggMaintStream.ViewStore
    val rows = Seq(("1-URGENT", 2L, new java.math.BigDecimal("10.5000")))
    store.merge(0L, rows)
    store.merge(0L, rows) // a redelivered batch must not double-count
    assert(store.snapshot == Map("1-URGENT" -> (2L, 10.5)))
    store.merge(1L, rows) // a NEW batch id does merge
    assert(store.snapshot == Map("1-URGENT" -> (4L, 21.0)))
  }
}
