package graft.ops

import graft.SparkTestBase

/** Semantic laws for the CBO-estimation wave (q306–q309): formula
  * accuracy on PK-FK edges, histogram error bounds, congressional
  * allocation guarantees, and the deff ≤ 1 variance-decomposition law.
  */
class CboOpsSpec extends SparkTestBase {

  test("cbo cardinality: estimates positive, within 4x of exact on star edges") {
    val rows = CboOps.q306CboCardinality.fn(spark, sfDir).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (est, act, err) = (r.getAs[Double]("est_rows"),
        r.getAs[Long]("actual_rows"), r.getAs[Double]("err_factor"))
      assert(est > 0 && act > 0)
      assert(math.abs(err - est / act) < 1e-3)
      assert(err > 0.25 && err < 4.0,
        s"${r.getAs[String]("join_name")}: formula off by $err")
    }
    // the PK side of orders=lineitem makes the formula exact up to orphans
    val pkfk = rows.find(_.getAs[String]("join_name") == "orders=lineitem").get
    assert(pkfk.getAs[Double]("err_factor") > 0.9 &&
      pkfk.getAs[Double]("err_factor") < 1.1)
  }

  test("histogram selectivity: bounded error, selectivity falls with threshold") {
    val rows = CboOps.q307HistogramSelectivity.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Double]("theta"), r.getAs[Double]("est_sel"),
        r.getAs[Double]("actual_sel"), r.getAs[Double]("abs_err")))
      .sortBy(_._1)
    assert(rows.length == 5)
    rows.foreach { case (_, est, act, err) =>
      assert(est >= 0 && est <= 1 && act >= 0 && act <= 1)
      assert(err <= 0.1, s"histogram estimate off by $err")
    }
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 <= a._3 },
      "actual selectivity not monotone in theta")
  }

  test("congressional sample: quotas drawn exactly, budget respected, small groups visible") {
    val rows = CboOps.q308CongressionalSample.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("sampled") == r.getAs[Long]("quota"),
        s"${r.getAs[String]("n_name")} drew fewer rows than its quota")
      assert(r.getAs[Long]("quota") <= r.getAs[Long]("pop"))
      val (h, sen) = (r.getAs[Double]("q_house"), r.getAs[Double]("q_senate"))
      assert(h > 0 && sen > 0)
      // the senate leg guarantees visibility: every populated group samples
      if (r.getAs[Long]("pop") >= 10) assert(r.getAs[Long]("quota") >= 1)
    }
    assert(rows.map(_.getAs[Long]("quota")).sum <= 1000L)
  }

  test("design effect: within-strata variance can only shrink the total") {
    val r = CboOps.q309DesignEffect.fn(spark, sfDir).collect()(0)
    val (srs, strat, deff) = (r.getAs[Double]("se2_srs_n1000"),
      r.getAs[Double]("se2_strat_n1000"), r.getAs[Double]("deff"))
    assert(srs > 0 && strat > 0)
    assert(deff > 0 && deff <= 1.0 + 1e-6,
      s"deff $deff violates the variance decomposition")
    assert(math.abs(deff - strat / srs) < 1e-3)
  }
}
