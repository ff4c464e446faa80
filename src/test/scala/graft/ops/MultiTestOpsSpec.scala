package graft.ops

import graft.SparkTestBase

/** Semantic checks for the BH-FDR wave (q390): the step-up decision is
  * replayed in plain Scala from the emitted p-values, and the adjusted
  * p-values obey the BH monotonicity laws.
  */
class MultiTestOpsSpec extends SparkTestBase {

  test("q390: step-up decisions and adjusted p-values match a replay") {
    val rows = MultiTestOps.q390BhFdr.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rank"))
    val m = rows.length
    assert(m > 1)
    val ps = rows.map(_.getAs[Double]("pval"))
    assert(ps.sorted.sameElements(ps), "rows are in ascending p order")

    // replay BH(0.10): largest k with p(k) <= k*alpha/m
    val kMax = (1 to m).filter(k => ps(k - 1) <= k * 0.10 / m)
      .lastOption.getOrElse(0)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Boolean]("rejected") == (i + 1 <= kMax))
      val thr = BigDecimal((i + 1) * 0.10 / m)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("bh_threshold") - thr) < 1e-9)
    }

    // adjusted p: suffix-min of m*p/rank, capped at 1, monotone in rank
    val adj = rows.map(_.getAs[Double]("p_adj"))
    adj.sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-9, "p_adj nondecreasing")
      case _ =>
    }
    val replayAdj = (1 to m).map { k =>
      math.min(1.0, (k to m).map(j => ps(j - 1) * m / j).min)
    }
    adj.zip(replayAdj).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-5, s"p_adj $a vs replay $e")
    }
    // every rejected hypothesis has p_adj <= alpha
    rows.filter(_.getAs[Boolean]("rejected"))
      .foreach(r => assert(r.getAs[Double]("p_adj") <= 0.10 + 1e-9))
  }
}
