package graft.ops

import graft.SparkTestBase

/** Semantic contracts for the signal operators beyond the oracle's
  * hash-compare: gate rates, range sanity, and the broadcast plan shape
  * that makes the baselines scale-free.
  */
class SignalSpec extends SparkTestBase {

  test("q129: z>3 gate fires rarely and the baseline joins broadcast") {
    val df = graft.SparkEntry.queries("q129_seasonal_anomaly")(
      spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "hour-of-day baseline is not broadcast")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, bad) = (r.getLong(1), r.getLong(2))
      assert(bad <= n / 10, s"${r.getString(0)}: $bad anomalies of $n obs")
    }
  }

  test("q130: one changepoint per type, inside the series' day range") {
    val rows = graft.SparkEntry.queries("q130_cusum_changepoint")(spark, sfDir)
      .collect()
    val types = rows.map(_.getString(0))
    assert(types.distinct.length == types.length, "duplicate changepoints")
    import org.apache.spark.sql.functions._
    val Array(lo, hi) = EventOps.events(spark, sfDir)
      .agg(min(to_date(col("ts"))), max(to_date(col("ts"))))
      .collect().head.toSeq.map(_.asInstanceOf[java.sql.Date]).toArray
    rows.foreach { r =>
      val day = r.getDate(1)
      assert(!day.before(lo) && !day.after(hi), s"changepoint $day outside [$lo,$hi]")
      assert(r.getDouble(2) >= 0.0)
      assert(r.getLong(3) > 0)
    }
  }

  test("q131: novelty is a fraction and unique trigrams never exceed total") {
    val rows = graft.SparkEntry.queries("q131_trigram_novelty")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, u, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(u <= n, s"doc ${r.getLong(0)}: $u unique of $n")
      assert(f >= 0.0 && f <= 1.0)
      assert(math.abs(f - u.toDouble / n) < 1e-15)
    }
    // the fixture is template-heavy: most trigrams repeat, so the median
    // novelty must sit well under 1 (the signal separates, not saturates)
    val med = rows.map(_.getDouble(3)).sorted.apply(rows.length / 2)
    assert(med < 0.9, s"median novelty $med — signal saturated")
  }
}
