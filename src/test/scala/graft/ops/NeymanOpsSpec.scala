package graft.ops

import graft.SparkTestBase

/** Semantic checks for the Neyman-allocation wave (q410): both
  * allocations conserve the budget exactly, Neyman beats (or ties)
  * proportional on stratified-mean variance, and the allocation is
  * monotone in N_h * sigma_h.
  */
class NeymanOpsSpec extends SparkTestBase {

  test("q410: budget conserved; Neyman variance <= proportional") {
    val rows = NeymanOps.q410NeymanAllocation.fn(spark, sfDir).collect()
    assert(rows.length >= 2, "need several priority strata")
    assert(rows.map(_.getAs[Long]("n_prop")).sum == 1000L)
    assert(rows.map(_.getAs[Long]("n_ney")).sum == 1000L)
    val vProp = rows.head.getAs[Double]("var_prop")
    val vNey = rows.head.getAs[Double]("var_ney")
    assert(vNey <= vProp + 1e-9,
      "Neyman allocation must not increase stratified-mean variance")
    assert(rows.forall(r => r.getAs[Double]("var_reduction") ==
      rows.head.getAs[Double]("var_reduction")))
    // monotone: larger nh*sigma never gets a smaller Neyman quota by >1
    // (largest-remainder can flip by at most one unit)
    val byScore = rows.sortBy(r =>
      r.getAs[Long]("nh") * r.getAs[Double]("sigma"))
    byScore.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(1).getAs[Long]("n_ney") >= w(0).getAs[Long]("n_ney") - 1)
    }
    rows.foreach(r => assert(r.getAs[Long]("n_ney") >= 0))
  }
}
