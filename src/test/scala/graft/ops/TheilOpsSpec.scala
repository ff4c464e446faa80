package graft.ops

import graft.SparkTestBase

/** Semantic checks for the Theil wave (q417): the additive
  * decomposition law T = T_between + Σ s_g·T_g, share closure, KL
  * non-negativity of the between term, and non-negative within terms.
  */
class TheilOpsSpec extends SparkTestBase {

  test("q417: additive decomposition, share closure, KL law") {
    val rows = TheilOps.q417TheilDecomposition.fn(spark, sfDir).collect()
    assert(rows.length >= 20, "expect ~25 nations")
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"income shares sum to 1: $shares")
    rows.foreach { r =>
      assert(r.getAs[Double]("t_within") >= -1e-9, "within-Theil >= 0")
    }
    val tTotal = rows.head.getAs[Double]("t_total")
    val tBetween = rows.head.getAs[Double]("t_between")
    val tWithin = rows.head.getAs[Double]("t_within_sum")
    assert(rows.forall(r => r.getAs[Double]("t_total") == tTotal))
    assert(tBetween >= -1e-9, "between-group Theil is a KL divergence")
    assert(tTotal > 0, "customer revenue is not perfectly equal")
    // additive decomposition (up to the documented 6-dp rounding)
    assert(math.abs(tTotal - (tBetween + tWithin)) < 5e-4,
      s"T=$tTotal != between=$tBetween + within=$tWithin")
    // contributions are share-weighted within terms
    rows.foreach { r =>
      val expect = BigDecimal(r.getAs[Double]("share") *
        r.getAs[Double]("t_within")).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("contrib") == expect)
    }
  }
}
