package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the feature-engineering & containment wave
  * (q274–q277): containment laws, the stump's argmax self-consistency,
  * leave-one-out accounting, and WoE/IV identities.
  */
class FeatureOpsSpec extends SparkTestBase {

  test("minhash containment: bounded, twins at 1, estimator in the k=32 noise band") {
    val rows = FeatureOps.q274MinhashContainment.fn(spark, sfDir).collect()
    assert(rows.nonEmpty, "no candidate pairs above containment 0.2")
    rows.foreach { r =>
      val ce = r.getAs[Double]("cont_exact")
      val est = r.getAs[Double]("cont_est")
      assert(ce >= 0.2 && ce <= 1.0)
      assert(est >= 0.0 && est <= 1.0)
      assert(r.getAs[Long]("sz_a") > 0 && r.getAs[Long]("sz_b") > 0)
      if (ce >= 0.999 && r.getAs[Double]("jac_est") >= 0.999)
        assert(est >= 0.999, "identical signatures must estimate full containment")
    }
    val meanErr = rows.map(_.getAs[Double]("abs_err")).sum / rows.length
    assert(meanErr < 0.25, s"mean containment error $meanErr beyond the k=32 noise band")
  }

  test("stump: accounting identities, the flagged best is the grid argmax") {
    val rows = FeatureOps.q275DecisionStump.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("feature"), r.getAs[Double]("thr"),
        r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
        r.getAs[Long]("pos_left"), r.getAs[Long]("pos_right"),
        r.getAs[Double]("gini_gain"), r.getAs[Boolean]("is_best")))
    assert(rows.length == 31, s"expected 31 grid cells, got ${rows.length}")
    val total = Tables(spark, sfDir).lineitem.count()
    rows.foreach { case (f, thr, nl, nr, pl, pr, gain, _) =>
      assert(nl + nr == total, s"$f@$thr: $nl + $nr != $total")
      assert(pl <= nl && pr <= nr)
      assert(gain >= -1e-9, s"$f@$thr: negative gain $gain")
    }
    val best = rows.filter(_._8)
    assert(best.length == 1)
    val maxGain = rows.map(_._7).max
    assert(best.head._7 == maxGain, "flagged best is not the max-gain cell")
  }

  test("target encoding: every order encoded, LOO identity holds on a spot check") {
    val rows = FeatureOps.q276TargetEncoding.fn(spark, sfDir).collect()
    val orders = Tables(spark, sfDir).orders.count()
    assert(rows.length == orders)
    // spot-check the LOO formula on one segment computed locally
    val base = Tables(spark, sfDir).orders
      .join(Tables(spark, sfDir).customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val mu = base.map(_._3).sum / base.length
    val seg = base.filter(_._2 == base.head._2)
    val sSeg = seg.map(_._3).sum
    val byKey = rows.map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Double]("loo_encoding")).toMap
    seg.take(5).foreach { case (k, _, y) =>
      val expect = (sSeg - y + 10.0 * mu) / (seg.length - 1 + 10)
      assert(math.abs(byKey(k) - expect) < 1.0,
        s"order $k: encoding ${byKey(k)} vs local $expect")
    }
  }

  test("WoE/IV: share-weighted WoE sums to ~0 per feature, IV non-negative and constant") {
    val rows = FeatureOps.q277WoeIv.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("feature"), r.getAs[String]("bin"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
        r.getAs[Double]("woe"), r.getAs[Double]("iv")))
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq("nation", "o_year", "segment"))
    rows.groupBy(_._1).foreach { case (f, g) =>
      val ivs = g.map(_._6).distinct
      assert(ivs.length == 1, s"$f: IV differs across bins")
      assert(ivs.head >= 0, s"$f: negative IV ${ivs.head}")
      // positive-share-weighted mean WoE ≈ ln-ratio telescopes toward 0
      val tp = g.map(_._3).sum.toDouble
      val tn = g.map(_._4).sum.toDouble
      val drift = g.map { case (_, _, p, n, w, _) => (p / tp - n / tn) * w }.sum
      assert(drift >= -1e-6, s"$f: IV reconstruction negative: $drift")
      assert(math.abs(drift - ivs.head) < 0.01, s"$f: IV ${ivs.head} vs reconstruction $drift")
    }
  }
}
