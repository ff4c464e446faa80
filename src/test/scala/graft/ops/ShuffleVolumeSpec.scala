package graft.ops

import graft.SparkTestBase
import graft.functions.SketchFunctions
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Measured — not argued — scale evidence: the bloom prefilter must cut
  * the rows that reach the semi join's shuffle. Runs the q126 shape with
  * the broadcast path disabled (forcing a real exchange, as a fact-fact
  * join at 100 TB would plan) and compares shuffle-write records with
  * and without the bloom probe via a task-metrics listener.
  */
class ShuffleVolumeSpec extends SparkTestBase {

  private def shuffleRecords(body: => Unit): Long = {
    val records = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // listenerBus is private[spark]; a short quiesce drains task-end
      // events (collect() above already joined the jobs)
      Thread.sleep(500)
    } finally spark.sparkContext.removeSparkListener(listener)
    records.get()
  }

  test("bloom prefilter cuts the semi join's shuffled row count") {
    SketchFunctions.registerSql(spark)
    val dir = "/root/testdata/sf0.01"
    val t = Tables(spark, dir)
    t.orders.createOrReplaceTempView("sv_orders")
    t.lineitem.createOrReplaceTempView("sv_lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val without = shuffleRecords {
        spark.sql(
          """SELECT l_returnflag, count(*) FROM sv_lineitem
             WHERE l_orderkey IN
               (SELECT o_orderkey FROM sv_orders WHERE o_totalprice > 400000.0)
             GROUP BY 1""").collect()
      }
      val withBloom = shuffleRecords {
        spark.sql(
          """SELECT l_returnflag, count(*) FROM sv_lineitem
             WHERE might_contain(
                 (SELECT bloom_filter_agg(o_orderkey, 100000L)
                  FROM sv_orders WHERE o_totalprice > 400000.0), l_orderkey)
               AND l_orderkey IN
               (SELECT o_orderkey FROM sv_orders WHERE o_totalprice > 400000.0)
             GROUP BY 1""").collect()
      }
      assert(withBloom > 0, "no shuffle at all — the forced-SMJ setup broke")
      assert(withBloom * 2 < without,
        s"bloom prune did not halve the shuffled rows: $withBloom vs $without")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
