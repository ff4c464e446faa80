package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the overdispersion wave (q424): moment replay,
  * census conservation, the NB-beats-Poisson model-choice law on
  * genuinely overdispersed data (sf0.01 — sf0.001's fixture is exactly
  * equidispersed, the saturation branch), and the saturation contract
  * itself at sf0.001.
  */
class DispersionOpsSpec extends SparkTestBase {

  test("q424: moment replay; NB beats Poisson on overdispersed data") {
    val dir = "/root/testdata/sf0.01" // sf0.001 is exactly equidispersed
    val rows = DispersionOps.q424NbOverdispersion.fn(spark, dir).collect()
    val nCust = Tables(spark, dir).customer.count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == nCust)

    val counts = Tables(spark, dir).customer.select(col("c_custkey").as("ck"))
      .join(Tables(spark, dir).orders.groupBy(col("o_custkey").as("ck"))
        .agg(count(lit(1)).as("x")), Seq("ck"), "left")
      .na.fill(0L, Seq("x"))
      .collect().map(_.getAs[Long]("x"))
    val n = counts.length
    val m = counts.sum.toDouble / n
    val v = counts.map(x => x.toDouble * x).sum / n - m * m
    val d = rows.head.getAs[Double]("disp_d")
    assert(math.abs(d - v / m) < 1e-4)
    assert(d > 1.0, "sf0.01 per-customer counts are overdispersed")
    assert(rows.head.getAs[Double]("k_hat") > 0)

    // MoM identity: the fitted NB reproduces the sample variance,
    // m + m²/k̂ = v (that is what method-of-moments means); Poisson
    // structurally cannot (its implied variance is m < v here)
    val kHat = rows.head.getAs[Double]("k_hat")
    val vOut = rows.head.getAs[Double]("v")
    assert(math.abs((m + m * m / kHat) - vOut) < 1e-3,
      s"NB implied variance ${m + m * m / kHat} != sample $vOut")
    assert(m < vOut, "Poisson's implied variance understates this data")
  }

  test("q424: equidispersed fixture saturates k and degrades NB to Poisson") {
    val rows = DispersionOps.q424NbOverdispersion.fn(spark, sfDir).collect()
    assert(math.abs(rows.head.getAs[Double]("disp_d") - 1.0) < 1e-3)
    assert(rows.head.getAs[Double]("k_hat") == 1e6, "saturation branch")
    rows.filter(_.getAs[Long]("bin") < 10).foreach { r =>
      assert(math.abs(r.getAs[Double]("exp_nb") -
        r.getAs[Double]("exp_poisson")) <
        math.max(1.0, 0.01 * r.getAs[Double]("exp_poisson")),
        s"NB(k=1e6) should track Poisson at bin ${r.getAs[Long]("bin")}")
    }
  }
}
