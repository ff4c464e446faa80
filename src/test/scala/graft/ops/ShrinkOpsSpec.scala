package graft.ops

import graft.SparkTestBase

/** Semantic checks for the empirical-Bayes wave (q431): the posterior
  * sits strictly between the raw rate and the pool mean, shrink weight
  * decreases in n, and the MoM prior replays exactly from the rates.
  */
class ShrinkOpsSpec extends SparkTestBase {

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q431: MoM replay, between-ness, monotone shrinkage") {
    val rows = ShrinkOps.q431BetaBinomialShrink.fn(spark, sfDir).collect()
    assert(rows.length == 25, "25 brands")
    assert(rows.forall(!_.getAs[Boolean]("saturated")),
      "the brand rates must carry real spread (MoM prior fits)")

    // MoM prior replay through the scaled-long accumulators
    val ps = rows.map(_.getAs[Double]("p_raw"))
    // p_raw in the output is rounded; recompute from x/n
    val raw = rows.map(row =>
      row.getAs[Long]("x").toDouble / row.getAs[Long]("n"))
    val k = raw.length
    val sp = raw.map(p => math.round(p * 1e9)).sum
    val spp = raw.map(p => math.round(p * p * 1e9)).sum
    val m = sp.toDouble / 1e9 / k
    val v = (spp.toDouble / 1e9 - sp.toDouble / 1e9 * sp / 1e9 / k) / (k - 1)
    val phi = m * (1 - m) / v - 1
    assert(phi > 0)
    val alpha = r(m * phi, 6); val beta = r((1 - m) * phi, 6)
    assert(rows.head.getAs[Double]("alpha") == alpha)
    assert(rows.head.getAs[Double]("beta") == beta)
    assert(rows.head.getAs[Double]("pool_m") == r(m, 9))

    rows.foreach { row =>
      val n = row.getAs[Long]("n"); val x = row.getAs[Long]("x")
      val pRaw = x.toDouble / n
      val pPost = row.getAs[Double]("p_post")
      val w = row.getAs[Double]("shrink_w")
      assert(pPost == r((x + alpha) / (n + alpha + beta), 9))
      assert(w == r((alpha + beta) / (n + alpha + beta), 9))
      assert(w > 0 && w < 1)
      // posterior lies between the raw rate and the pool mean
      if (pRaw != m)
        assert((pPost - pRaw) * (pPost - m) < 0,
          s"${row.getAs[String]("brand")}: posterior must sit between")
    }
    // shrink weight decreases with n
    val byN = rows.sortBy(_.getAs[Long]("n"))
      .map(_.getAs[Double]("shrink_w"))
    assert(byN.zip(byN.tail).forall { case (a, b) => a >= b })
    assert(ps.distinct.length > 1)
  }
}
