package graft.ops

import graft.SparkTestBase

/** Semantic checks for the GMM-EM wave (q413): the EM ascent law
  * (likelihood never falls between rounds), mixture-weight closure,
  * positive variances, and component separation.
  */
class GmmOpsSpec extends SparkTestBase {

  test("q413: EM ascent, weight closure, component separation") {
    val rows = GmmOps.q413GmmEm.fn(spark, sfDir).collect()
    assert(rows.length == 4)
    val byIter = rows.groupBy(_.getAs[Long]("iter"))
    assert(byIter.keySet == Set(1L, 2L))
    byIter.foreach { case (_, rs) =>
      assert(rs.length == 2)
      val pis = rs.map(_.getAs[Double]("pi"))
      assert(math.abs(pis.sum - 1.0) < 1e-8, "mixture weights close to 1")
      rs.foreach { r =>
        assert(r.getAs[Double]("sigma") > 0)
        assert(r.getAs[Double]("pi") > 0 && r.getAs[Double]("pi") < 1)
      }
      val mus = rs.sortBy(_.getAs[String]("component")).map(_.getAs[Double]("mu"))
      assert(mus(0) < mus(1), "moment init ordering preserved")
    }
    // EM monotonicity: avg_ll reported for round k is evaluated at the
    // params round k STARTED from, so ll(2) >= ll(1) is the ascent law
    val ll1 = byIter(1L).head.getAs[Double]("avg_ll")
    val ll2 = byIter(2L).head.getAs[Double]("avg_ll")
    assert(ll2 >= ll1 - 1e-6, s"EM must not decrease likelihood: $ll1 -> $ll2")
  }
}
