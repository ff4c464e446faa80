package graft.ops

import graft.SparkTestBase

/** Semantic checks for the ANN-tuning & causal wave (q278–q281):
  * nprobe monotonicity, cross-shard mass conservation, IV null
  * calibration under a strong first stage, and the RDD jump identity.
  */
class CausalOpsSpec extends SparkTestBase {

  test("ANN sweep: candidates and overlap monotone in nprobe, recall valid") {
    val rows = CausalOps.q278AnnRecallSweep.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("query_id"),
        r.getAs[Long]("n_overlap"), r.getAs[Long]("n_candidates"),
        r.getAs[Double]("recall")))
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    rows.foreach { case (_, _, ov, nc, rec) =>
      assert(ov >= 0 && ov <= 10)
      assert(nc >= ov)
      assert(math.abs(rec - ov / 10.0) < 1e-9)
    }
    rows.groupBy(_._2).foreach { case (q, g) =>
      val byNp = g.sortBy(_._1)
      byNp.sliding(2).foreach { case Array(a, b) =>
        assert(a._4 <= b._4, s"query $q: candidates shrank ${a._4} -> ${b._4}")
        assert(a._3 <= b._3, s"query $q: overlap shrank at nprobe ${b._1}")
      }
    }
  }

  test("cross-shard audit: pair mass conserved, cross share near the 15/16 random law") {
    val rows = CausalOps.q279CrossShardDupAudit.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nPairs = rows.map(_.getAs[Long]("n_pairs")).sum
    val truth = Dedup.q28MinhashLsh.fn(spark, sfDir).count()
    assert(nPairs == truth, s"audited $nPairs pairs vs q28's $truth")
    val nCross = rows.map(_.getAs[Long]("n_cross")).sum
    assert(nCross.toDouble / nPairs > 0.6,
      s"cross share ${nCross.toDouble / nPairs} — random 16-way sharding promises ~0.94")
    rows.foreach { r =>
      assert(r.getAs[Long]("shard") >= 0 && r.getAs[Long]("shard") < 16)
      assert(r.getAs[Long]("n_cross") <= r.getAs[Long]("n_pairs"))
    }
  }

  test("IV: strong first stage by construction, both estimators land near the true zero") {
    val r = CausalOps.q280Iv2sls.fn(spark, sfDir).collect()(0)
    val fs = r.getAs[Double]("first_stage")
    assert(fs > 0.45 && fs < 0.75, s"first stage $fs strays from the constructed 0.6")
    // no true effect exists; the Wald ratio must not explode
    assert(math.abs(r.getAs[Double]("beta_iv")) < 40000,
      s"beta_iv ${r.getAs[Double]("beta_iv")} — null-effect calibration failed")
    assert(math.abs(r.getAs[Double]("beta_ols")) < 40000)
    assert(r.getAs[Long]("n") == Tables(spark, sfDir).orders.count())
  }

  test("RDD: two sides, jump equals the intercept gap, null calibration holds") {
    val rows = CausalOps.q281RegressionDiscontinuity.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("side")).sorted.toSeq == Seq("left", "right"))
    val jump = rows.head.getAs[Double]("jump")
    assert(rows.forall(r => r.getAs[Double]("jump") == jump))
    val bysSide = rows.map(r => r.getAs[String]("side") -> r.getAs[Double]("intercept")).toMap
    assert(math.abs(jump - (bysSide("right") - bysSide("left"))) < 1e-4)
    // priority is independent of order value → the honest jump is ~0
    assert(math.abs(jump) < 0.25, s"null-calibration jump $jump")
    rows.foreach(r => assert(r.getAs[Long]("n") > 10, "bandwidth lost its sample"))
  }
}
