package graft.ops

import graft.SparkTestBase

/** Semantic laws for the SPC & linkage wave (q294–q297): chart-limit
  * consistency, correlation bounds, pattern-weight ordering, and the
  * Nelson–Aalen vs −ln(KM) sandwich.
  */
class ControlOpsSpec extends SparkTestBase {

  test("ewma control: limits constant, breach flag recomputes, smoothing stays in range") {
    val rows = ControlOps.q294EwmaControl.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val centers = rows.map(_.getAs[Double]("center")).distinct
    val limits = rows.map(_.getAs[Double]("limit")).distinct
    assert(centers.size == 1 && limits.size == 1, "center line / limit not constant")
    assert(limits.head > 0)
    val (lo, hi) = (rows.map(_.getAs[Double]("rev")).min, rows.map(_.getAs[Double]("rev")).max)
    rows.foreach { r =>
      val e = r.getAs[Double]("ewma")
      assert(e >= lo - 1e-6 && e <= hi + 1e-6, s"ewma $e outside the data range")
      val expected = math.abs(e - centers.head) > limits.head
      // the flag was computed pre-round; allow the knife's-edge rounding case
      if (math.abs(math.abs(e - centers.head) - limits.head) > 1e-5)
        assert(r.getAs[Boolean]("breach") == expected)
    }
  }

  test("lag xcorr: eight lags, r bounded, pair counts shrink with lag") {
    val rows = ControlOps.q295LagXcorr.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("lag"), r.getAs[Long]("n_days"), r.getAs[Double]("r")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 7L))
    rows.foreach { case (_, n, r) =>
      assert(n > 0)
      assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
    }
    // spine gaps make the count non-monotone in k, but each lag-k pair
    // needs both endpoints present: at most n(0) pairs, and at least
    // n(0) - k·(gaps+1) (each missing day can break at most one pair per
    // endpoint side)
    val n0 = rows.head._2
    rows.foreach { case (k, n, _) => assert(n <= n0 && n >= n0 - 2 * k * (2500 - n0)) }
  }

  test("fellegi-sunter: patterns partition the blocked pairs, weights order by agreement") {
    val rows = ControlOps.q296FellegiSunter.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Boolean]("seg_agree"), r.getAs[Boolean]("bal_agree")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("weight"), r.getAs[Boolean]("is_match")))
      .toMap
    assert(rows.keySet == Set((true, true), (true, false), (false, true), (false, false)))
    // full agreement outweighs partial outweighs none
    val w = rows.view.mapValues(_._2).toMap
    assert(w((true, true)) > w((true, false)) && w((true, true)) > w((false, true)))
    assert(w((true, false)) > w((false, false)) && w((false, true)) > w((false, false)))
    assert(rows((true, true))._3, "the full-agreement pattern must score as a match")
    // the patterns partition the blocked candidate set exactly
    import org.apache.spark.sql.functions._
    val c = Tables(spark, sfDir).customer.select(col("c_custkey").as("k"),
      col("c_nationkey").as("nat"), floor(col("c_acctbal") / 1000.0).as("bb"))
    val total = c.as("a").join(c.as("b"),
      col("a.nat") === col("b.nat") && col("a.bb") === col("b.bb") &&
        col("a.k") < col("b.k")).count()
    assert(rows.values.map(_._1).sum == total)
  }

  test("nelson-aalen: hazard accumulates, risk set shrinks, H <= -ln(KM) where defined") {
    val rows = ControlOps.q297NelsonAalen.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("t_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d_events"), r.getAs[Double]("cum_hazard"),
        Option(r.getAs[java.lang.Double]("neg_log_km")).map(_.doubleValue)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4 - 1e-9, "cumulative hazard decreased")
      assert(b._2 <= a._2, "risk set grew over time")
    }
    rows.foreach { case (_, n, d, h, nlkm) =>
      assert(d >= 1 && d <= n)
      nlkm.foreach(v => assert(h <= v + 1e-6,
        s"Nelson-Aalen H $h above -ln(KM) $v"))
    }
  }
}
