package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming AMS ≡ batch AMS: counter addition is commutative and exact,
  * so the standing counters must equal the one-shot fold counter for
  * counter under any slicing — and the read-out must equal q483's
  * registered estimate on the same keys. */
class F2StreamSpec extends SparkTestBase {

  private def replay(keys: Array[Long], batchSize: Int): F2Stream.F2Store = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Long]
    val store = new F2Stream.F2Store
    val q = F2Stream.maintain(input.toDF().toDF("k"), store)
    try {
      keys.grouped(batchSize).foreach { slice =>
        input.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    store
  }

  test("stream == batch counters under two slicings + shuffled order; estimate == q483") {
    import spark.implicits._
    val keys = graft.ops.Tables(spark, sfDir).lineitem
      .select(col("l_partkey")).collect().map(_.getLong(0))

    // one-shot batch fold with the SAME projection
    val batchCounters = F2Stream.signedDeltas(
        keys.toSeq.toDF("k"))
      .collect().map(r => r.getAs[Int]("j") -> r.getAs[Long]("d"))
      .sortBy(_._1).map(_._2).toSeq

    val shuffled = new scala.util.Random(7).shuffle(keys.toSeq).toArray
    val stores = Seq(replay(keys, 500), replay(keys, 1777), replay(shuffled, 913))
    for (st <- stores) {
      assert(st.counters == batchCounters, "counters must match exactly")
      assert(st.n == keys.length.toLong)
    }

    // read-out equals q483's registered estimate (rounded the same way)
    val q483 = graft.ops.FreqMomentOps.q483AmsF2.fn(spark, sfDir).head()
    val est = BigDecimal(stores.head.estimate)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(est == q483.getAs[Double]("f2_est"),
      s"stream read-out $est != q483 ${q483.getAs[Double]("f2_est")}")
  }

  test("merge skips redelivered batch ids (foreachBatch retry contract)") {
    val store = new F2Stream.F2Store
    store.merge(0L, Seq(1 -> 5L), 3L)
    store.merge(0L, Seq(1 -> 5L), 3L) // retry: must be a no-op
    store.merge(1L, Seq(1 -> 2L), 1L)
    assert(store.counters(1) == 7L && store.n == 4L)
  }
}
