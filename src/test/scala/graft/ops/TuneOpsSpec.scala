package graft.ops

import graft.SparkTestBase

/** Semantic checks for the tuning & budget wave (q282–q285): coverage
  * monotonicity, the halving tournament's survival law, energy
  * monotonicity in k, and flow conservation of the rebalance plan.
  */
class TuneOpsSpec extends SparkTestBase {

  test("OOV coverage: falls with n for types, counts conserved") {
    val rows = TuneOps.q282OovCoverage.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("n_test_types"),
        r.getAs[Long]("n_covered"), r.getAs[Double]("type_coverage"),
        r.getAs[Double]("mass_coverage"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    rows.foreach { case (_, types, cov, tc, mc) =>
      assert(cov <= types)
      assert(tc >= 0 && tc <= 1 && mc >= 0 && mc <= 1)
      assert(mc >= tc - 1e-9, "mass coverage below type coverage — frequent grams should be seen")
    }
    assert(rows(0)._4 >= rows(1)._4 && rows(1)._4 >= rows(2)._4,
      s"type coverage not decreasing in n: ${rows.map(_._4).mkString(",")}")
  }

  test("successive halving: rung sizes 16/8/4, the constructed best arm survives to the end") {
    val rows = TuneOps.q283SuccessiveHalving.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("rung"), r.getAs[Long]("arm"),
        r.getAs[Long]("n_evals"), r.getAs[Double]("mean_reward"), r.getAs[Long]("rank")))
    val byRung = rows.groupBy(_._1)
    assert(byRung(1L).size == 16 && byRung(2L).size == 8 && byRung(3L).size == 4)
    // arms in rung r+1 are exactly the top arms of rung r
    val top8 = byRung(1L).filter(_._5 <= 8).map(_._2).toSet
    assert(byRung(2L).map(_._2).toSet == top8)
    val top4 = byRung(2L).filter(_._5 <= 4).map(_._2).toSet
    assert(byRung(3L).map(_._2).toSet == top4)
    // p_a = 0.2 + 0.03a makes arm 15 the true best; it must survive
    assert(byRung(3L).map(_._2).contains(15L), "the best constructed arm was eliminated")
    // budget grows down the rungs
    assert(byRung(2L).head._3 > byRung(1L).head._3)
    assert(byRung(3L).head._3 > byRung(2L).head._3)
  }

  test("top-k sparsify: energy monotone in k, k=64 keeps everything") {
    val rows = TuneOps.q284TopkSparsify.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("mean_energy"),
        r.getAs[Double]("min_energy"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(4L, 16L, 64L))
    assert(rows(0)._2 <= rows(1)._2 && rows(1)._2 <= rows(2)._2)
    assert(math.abs(rows(2)._2 - 1.0) < 1e-6, s"k=64 mean energy ${rows(2)._2} != 1")
    assert(math.abs(rows(2)._3 - 1.0) < 1e-6)
    rows.foreach { case (_, me, mn) => assert(mn <= me + 1e-9) }
    // top-4 of 64 roughly-isotropic dims keeps a minority of the energy
    assert(rows(0)._2 < 0.6, s"k=4 mean energy ${rows(0)._2} implausibly high")
  }

  test("rebalance: targets sum to the total, flows conserve, last boundary closes at zero") {
    val rows = TuneOps.q285ShardRebalance.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("load"), r.getAs[Long]("target"),
        r.getAs[Long]("surplus"), r.getAs[Long]("flow_out"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 7L))
    val total = rows.map(_._2).sum
    assert(rows.map(_._3).sum == total, "targets do not sum to the total load")
    assert(rows.map(_._3).max - rows.map(_._3).min <= 1, "targets not balanced")
    rows.foreach { case (_, l, t, s, _) => assert(s == l - t) }
    // the running flow at the last shard must close the circuit exactly
    assert(rows.last._5 == 0L, s"final boundary flow ${rows.last._5} != 0")
    // flow recurrence: flow_i = flow_{i-1} + surplus_i
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 == a._5 + b._4, s"flow recurrence broken at shard ${b._1}")
    }
  }
}
