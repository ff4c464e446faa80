package graft.ops

import graft.SparkTestBase

/** Semantic checks for the SRE & ops-analytics wave (q290–q293):
  * burn-window smoothing laws, storm accounting, headroom bounds, and
  * the Little's-law identity closing near 1.
  */
class SreOpsSpec extends SparkTestBase {

  test("error budget: two window configs, smoothing can only lower the max burn") {
    val rows = SreOps.q290ErrorBudgetBurn.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("window_hours") ->
        (r.getAs[Long]("n_hours"), r.getAs[Double]("max_burn"), r.getAs[Long]("n_alert_hours")))
      .toMap
    assert(rows.keySet == Set(1L, 6L))
    rows.values.foreach { case (n, mx, alerts) =>
      assert(mx >= 0)
      assert(alerts >= 0 && alerts <= n)
    }
    assert(rows(6L)._2 <= rows(1L)._2 + 1e-9,
      s"6h max burn ${rows(6L)._2} above the 1h max ${rows(1L)._2}")
  }

  test("retry storms: chain accounting consistent, threshold respected") {
    val rows = SreOps.q291RetryStorms.fn(spark, sfDir).collect()
    rows.foreach { r =>
      val ev = r.getAs[Long]("n_error_events")
      val st = r.getAs[Long]("n_storms")
      val mx = r.getAs[Long]("max_storm_len")
      assert(mx >= 2, "user below the storm threshold surfaced")
      assert(ev >= st, "fewer error events than storms")
      assert(ev >= mx)
    }
  }

  test("capacity headroom: bounded, the peak day has zero headroom") {
    val rows = SreOps.q292CapacityHeadroom.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("peak_active"),
        r.getAs[Long]("provisioned"), r.getAs[Double]("headroom"),
        r.getAs[Boolean]("over_80pct")))
    assert(rows.nonEmpty)
    val prov = rows.head._3
    assert(rows.forall(_._3 == prov), "provisioned differs across days")
    assert(rows.exists(_._4 == 0.0), "no day reaches the provisioned peak")
    rows.foreach { case (_, peak, _, hr, over) =>
      assert(hr >= 0 && hr <= 1)
      assert(over == (peak.toDouble > 0.8 * prov))
    }
  }

  test("Little's law: identity recomputes, measured-vs-law ratio closes near 1") {
    val r = SreOps.q293LittlesLaw.fn(spark, sfDir).collect()(0)
    // only orders WITH lineitems have a lifecycle (inner join by design)
    val withItems = Tables(spark, sfDir).lineitem
      .select(org.apache.spark.sql.functions.col("l_orderkey")).distinct()
      .join(Tables(spark, sfDir).orders,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey")).count()
    assert(r.getAs[Long]("n_orders") == withItems)
    val lam = r.getAs[Double]("lambda_per_day")
    val wD = r.getAs[Double]("w_days")
    val lLaw = r.getAs[Double]("l_littles")
    assert(math.abs(lLaw - lam * wD) < 1e-3, s"identity broke: $lLaw vs ${lam * wD}")
    val ratio = r.getAs[Double]("ratio")
    assert(ratio > 0.85 && ratio < 1.15,
      s"sweep-line L and λ·W disagree: ratio $ratio")
  }
}
