package graft.ops

import graft.SparkTestBase

/** Semantic checks for the ANF wave (q398): exact ball sizes follow the
  * BFS laws and the sketch estimate tracks them within the
  * linear-counting error regime on this fixture.
  */
class AnfOpsSpec extends SparkTestBase {

  test("q398: report rows obey ball-growth and estimator laws") {
    val rows = AnfOps.q398AnfSketch.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.length == 4)
    // round 0: every node's ball is exactly itself
    assert(rows.head.getAs[Double]("avg_exact") == 1.0)
    // node count constant across rounds; balls never shrink
    val n = rows.head.getAs[Long]("n_nodes")
    rows.foreach(r => assert(r.getAs[Long]("n_nodes") == n))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Double]("avg_exact") >=
          a.getAs[Double]("avg_exact") - 1e-9)
      case _ =>
    }
    // estimator sanity: with 252 registers and balls well under
    // saturation, mean estimate stays within 35% of the exact mean
    rows.foreach { r =>
      val est = r.getAs[Double]("avg_est")
      val ex = r.getAs[Double]("avg_exact")
      assert(est > 0 && math.abs(est - ex) / ex < 0.35,
        s"round ${r.getAs[Long]("round")}: est $est vs exact $ex")
      assert(r.getAs[Double]("avg_rel_err") >= 0)
    }
  }
}
