package graft.ops

import graft.SparkTestBase

/** Semantic laws for the operations-research wave (q322–q325): Erlang
  * monotonicity, newsvendor optimality, service-level ordering, and
  * Croston identities.
  */
class OpsResearchOpsSpec extends SparkTestBase {

  test("erlang: stable queues, waiting probability falls with servers, SLA reachable") {
    val rows = OpsResearchOps.q322ErlangStaffing.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("c"), r.getAs[Double]("rho"),
        r.getAs[Double]("p_wait"), r.getAs[Double]("asa_s"),
        r.getAs[Boolean]("meets_sla")))
      .sortBy(_._1)
    assert(rows.length == 8)
    rows.foreach { case (_, rho, pw, asa, _) =>
      assert(rho > 0 && rho < 1, "unstable queue in the sweep")
      assert(pw >= 0 && pw <= 1 && asa >= 0)
    }
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 <= a._3 + 1e-9 },
      "P(wait) rose with more servers")
    assert(rows.exists(_._5), "no server count in the sweep meets the SLA")
  }

  test("newsvendor: the critical-fractile stock never costs more than stocking the mean") {
    val rows = OpsResearchOps.q323Newsvendor.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (co, cm, sv) = (r.getAs[Long]("cost_opt"), r.getAs[Long]("cost_mean"),
        r.getAs[Long]("saving"))
      assert(co <= cm, s"${r.getAs[String]("n_name")}: quantile stock cost $co > mean stock $cm")
      assert(sv == cm - co && sv >= 0)
      assert(r.getAs[Long]("s_opt") >= r.getAs[Long]("s_mean"),
        "with underage 4x overage the optimal stock should sit above the mean")
    }
  }

  test("safety stock: rises with the service level, reorder point recomputes") {
    val rows = OpsResearchOps.q324SafetyStock.fn(spark, sfDir).collect()
      .groupBy(_.getAs[String]("brand"))
    rows.foreach { case (brand, rs) =>
      val byLevel = rs.sortBy(_.getAs[Double]("service_level"))
      assert(byLevel.map(_.getAs[Double]("service_level")).toSeq ==
        Seq(0.90, 0.95, 0.99))
      val ss = byLevel.map(_.getAs[Double]("safety_stock"))
      assert(ss.sliding(2).forall { case Array(a, b) => b >= a },
        s"$brand: safety stock fell as service level rose")
      byLevel.foreach { r =>
        val expected = r.getAs[Double]("mu_daily") * 7.0 + r.getAs[Double]("safety_stock")
        assert(math.abs(r.getAs[Double]("reorder_point") - expected) < 0.01)
      }
    }
  }

  test("croston: inter-demand interval >= 1 day, forecast is the ratio") {
    val rows = OpsResearchOps.q325CrostonForecast.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (z, p, f) = (r.getAs[Double]("z_hat"), r.getAs[Double]("p_hat"),
        r.getAs[Double]("demand_per_day"))
      assert(z > 0 && p >= 1.0, s"part ${r.getAs[Long]("part")}: p_hat $p below one day")
      assert(math.abs(f - z / p) < 1e-4)
      assert(r.getAs[Long]("n_demand_days") <= 60)
    }
  }
}
