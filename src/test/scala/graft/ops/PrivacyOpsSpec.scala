package graft.ops

import graft.SparkTestBase

/** Semantic laws for the privacy wave (q326–q329): accounting
  * identities, noise-clamp bounds, the randomized-response bias
  * correction, and EMD bounds.
  */
class PrivacyOpsSpec extends SparkTestBase {

  test("l-diversity: accounting consistent, diversity at least 1") {
    val r = PrivacyOps.q326LDiversity.fn(spark, sfDir).collect()(0)
    val (nc, nr, lmin, risk) = (r.getAs[Long]("n_classes"), r.getAs[Long]("n_records"),
      r.getAs[Long]("l_min"), r.getAs[Long]("at_risk"))
    assert(nc > 0 && nr >= nc && lmin >= 1)
    assert(risk >= 0 && risk <= nr)
    assert(math.abs(r.getAs[Double]("at_risk_share") - risk.toDouble / nr) < 1e-6)
    val joined = Tables(spark, sfDir).customer
      .join(Tables(spark, sfDir).orders,
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey")).count()
    assert(nr == joined)
  }

  test("dp histogram: released counts non-negative, L1 totals its bins") {
    val rows = PrivacyOps.q327DpHistogram.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val l1 = rows.map(_.getAs[Long]("l1_total")).distinct
    assert(l1.size == 1)
    var total = 0L
    rows.foreach { r =>
      val (t, rel, err) = (r.getAs[Long]("true_n"), r.getAs[Long]("released"),
        r.getAs[Long]("abs_err"))
      assert(rel >= 0)
      assert(err == math.abs(rel - t))
      total += err
    }
    assert(total == l1.head)
  }

  test("randomized response: estimator identity holds, recovery within noise") {
    val r = PrivacyOps.q328RandomizedResponse.fn(spark, sfDir).collect()(0)
    val (tr, obs, est, err) = (r.getAs[Double]("true_rate"), r.getAs[Double]("obs_rate"),
      r.getAs[Double]("est_rate"), r.getAs[Double]("abs_err"))
    assert(tr > 0 && tr < 1 && obs > 0 && obs < 1)
    assert(math.abs(est - (obs + 0.75 - 1.0) / 0.5) < 1e-5)
    assert(math.abs(err - math.abs(est - tr)) < 1e-5)
    // 5-sigma of the corrected estimator at n respondents
    val n = r.getAs[Long]("n")
    val sigma = 2.0 * math.sqrt(obs * (1 - obs) / n)
    assert(err < 5 * sigma + 1e-3, s"RR recovery error $err above 5 sigma $sigma")
  }

  test("t-closeness: EMD bounded, at-risk accounting consistent") {
    val r = PrivacyOps.q329TCloseness.fn(spark, sfDir).collect()(0)
    val (nc, nr, emdMax, risk) = (r.getAs[Long]("n_classes"), r.getAs[Long]("n_records"),
      r.getAs[Double]("emd_max"), r.getAs[Long]("at_risk"))
    assert(nc > 0 && nr >= nc)
    assert(emdMax >= 0 && emdMax <= 1.0)
    assert(risk >= 0 && risk <= nr)
    assert(math.abs(r.getAs[Double]("at_risk_share") - risk.toDouble / nr) < 1e-6)
  }
}
