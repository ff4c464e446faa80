package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the QTE wave (q406): decile picks are exact
  * order statistics per arm, and the effect columns are consistent.
  */
class QteOpsSpec extends SparkTestBase {

  test("q406: decile QTEs equal per-arm order-statistic replay") {
    val rows = QteOps.q406QuantileEffects.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Double]("tau"))
    assert(rows.length == 9)

    val o = Tables(spark, sfDir).orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1), r.getDouble(2)))
    def q(arm: Long, tau: Double): Double = {
      val sorted = o.filter(_._1 == arm).sortBy(d => (d._3, d._2))
      sorted(math.ceil(tau * sorted.length).toInt - 1)._3
    }
    rows.foreach { r =>
      val tau = r.getAs[Double]("tau")
      val c = q(0, tau); val t = q(1, tau)
      assert(math.abs(r.getAs[Double]("q_ctrl") - c) < 1e-2, s"tau $tau ctrl")
      assert(math.abs(r.getAs[Double]("q_treat") - t) < 1e-2, s"tau $tau treat")
      assert(math.abs(r.getAs[Double]("qte") - (t - c)) < 1e-2)
      assert(math.abs(r.getAs[Double]("qte_rel") - (t - c) / c) < 1e-4)
    }
    // quantile curves are nondecreasing in tau per arm
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("q_ctrl") <= b.getAs[Double]("q_ctrl"))
        assert(a.getAs[Double]("q_treat") <= b.getAs[Double]("q_treat"))
      case _ =>
    }
  }
}
