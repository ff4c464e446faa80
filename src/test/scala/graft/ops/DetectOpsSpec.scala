package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the synthetic-text detection wave (q356–q357):
  * the negative-control law for the watermark detector and KL
  * non-negativity/selectivity for the stopword profile.
  */
class DetectOpsSpec extends SparkTestBase {

  test("q356: on unwatermarked text z behaves standard-normal — mean ~0, tails ~nominal, no 4-sigma flags") {
    val rows = DetectOps.q356WatermarkDetect.fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length > 400)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_trials") >= 16)
      assert(r.getAs[Long]("n_green") <= r.getAs[Long]("n_trials"))
    }
    val zs = rows.map(_.getAs[Double]("z"))
    val mean = zs.sum / zs.length
    // per-doc z is Binomial-fair, but template families SHARE pair sets so
    // the 471 z's are correlated across docs — the sample mean can sit a
    // few tenths off 0 without any per-doc bias
    assert(math.abs(mean) < 0.5, s"z mean $mean far from 0 — green rule biased")
    val sd = math.sqrt(zs.map(z => (z - mean) * (z - mean)).sum / (zs.length - 1))
    assert(sd > 0.7 && sd < 1.4, s"z sd $sd far from 1")
    val beyond2 = zs.count(math.abs(_) > 2.0).toDouble / zs.length
    assert(beyond2 < 0.15, s"${beyond2 * 100}%% of docs beyond 2 sigma")
    assert(!rows.exists(_.getAs[Boolean]("flagged")),
      "4-sigma watermark flag fired on the negative control")
  }

  test("q357: KL is non-negative, zero only for corpus-matching profiles, and discriminates") {
    val rows = DetectOps.q357StopwordDivergence.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_stop") >= 5)
      // smoothing keeps KL finite; Gibbs: KL >= 0 up to the round-6 grain
      assert(r.getAs[Double]("kl_bits") >= -1e-6,
        s"doc ${r.getAs[Long]("doc_id")} negative KL ${r.getAs[Double]("kl_bits")}")
    }
    val kls = rows.map(_.getAs[Double]("kl_bits"))
    assert(kls.max > kls.min + 0.05, "KL constant across docs — no signal")
  }
}
