package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming Kalman ≡ batch Kalman bit-for-bit: the recurrence has no
  * reassociation freedom, so any IN-ORDER slicing folds to the same
  * doubles q514 reports. */
class KalmanStreamSpec extends SparkTestBase {

  private def replay(rows: Seq[(String, String, Long)],
                     batchSize: Int): KalmanStream.KalmanStore = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val store = new KalmanStream.KalmanStore
    val q = KalmanStream.maintain(
      input.toDF().toDF("cls", "day", "z"), store)
    try {
      rows.grouped(batchSize).foreach { slice =>
        input.addData(slice)
        q.processAllAvailable()
      }
    } finally q.stop()
    store
  }

  test("stream == q514 under two in-order slicings; retry is a no-op") {
    val daily = graft.ops.Tables(spark, sfDir).orders
      .groupBy(col("o_orderpriority").as("cls"),
        expr("CAST(CAST(o_orderdate AS DATE) AS STRING)").as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "DIV 100000").as("z"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2)) // day order per series
      .toSeq

    val q514 = graft.ops.KalmanOps.q514KalmanFilter.fn(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    def r(x: Double, n: Int) =
      BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (store <- Seq(replay(daily, 173), replay(daily, 997))) {
      val snap = store.snapshot
      assert(snap.keySet == q514.keySet)
      snap.foreach { case (cls, st) =>
        val (n, lvl, k, p) = q514(cls)
        assert(st.n == n, s"$cls n")
        assert(r(st.lvl, 6) == lvl, s"$cls level")
        assert(r(st.k, 9) == k, s"$cls gain")
        assert(r(st.p, 9) == p, s"$cls variance")
      }
    }

    // retry contract
    val store = new KalmanStream.KalmanStore
    store.merge(0L, Seq(("a", "2024-01-01", 5L)))
    store.merge(0L, Seq(("a", "2024-01-01", 5L))) // redelivery: no-op
    store.merge(1L, Seq(("a", "2024-01-02", 7L)))
    assert(store.snapshot("a").n == 2L)
  }
}
