package graft.streaming

import graft.SparkTestBase
import graft.functions.Aggregators.QuantileSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming KLL ≡ its own certificate: n is exact under any slicing,
  * every read-out sits inside the sketch-certified rank bracket against
  * the TRUE ranks, and a fixed slicing replays bit-identically (the
  * sketch is derandomized). */
class QuantileStreamSpec extends SparkTestBase {

  private val Phis = Seq(0.01, 0.25, 0.50, 0.75, 0.99)

  private def replay(vals: Array[Long], batchSize: Int): QuantileStream.QuantileStore = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Long]
    val store = new QuantileStream.QuantileStore
    val q = QuantileStream.maintain(input.toDF().toDF("v"), store)
    try {
      vals.grouped(batchSize).foreach { slice =>
        input.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    store
  }

  test("read-outs stay inside the certified bracket under two slicings; n exact") {
    val cents = graft.ops.Tables(spark, sfDir).lineitem
      .select(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
      .collect().map(_.getLong(0))
    val sorted = cents.sorted
    val n = cents.length.toLong

    for (store <- Seq(replay(cents, 500), replay(cents, 1777))) {
      assert(store.n == n, "row count must be exact")
      for (phi <- Phis) {
        val target = math.ceil(phi * n).toLong
        val (v, budget) = store.estimate(phi)
        val below = sorted.count(_ < v).toLong   // count(< v)
        val atOrBelow = sorted.count(_ <= v).toLong
        assert(below <= target + budget && atOrBelow >= target - budget,
          s"phi=$phi: v=$v true ranks [$below, $atOrBelow] " +
            s"outside target $target ± $budget")
        assert(budget <= n / 8, s"budget $budget blew the n/8 sanity bound")
      }
    }
  }

  test("fixed slicing replays bit-identically (derandomized merge history)") {
    val vals = Array.tabulate(20000)(i => ((i * 2654435761L) % 100000L))
    val a = replay(vals, 700).snapshot
    val b = replay(vals, 700).snapshot
    assert(a == b, "same slicing must produce identical sketch state")
  }

  test("merge skips redelivered batch ids (foreachBatch retry contract)") {
    val store = new QuantileStream.QuantileStore
    val d1 = QuantileSketch.foldPartition(Iterator(1L, 2L, 3L), 256)
    store.merge(0L, d1)
    store.merge(0L, d1) // retry: must be a no-op
    store.merge(1L, QuantileSketch.foldPartition(Iterator(4L), 256))
    assert(store.n == 4L)
  }
}
