package graft.ops

import graft.SparkTestBase

/** Semantic checks for the scaling-law wave (q378): nesting, the
  * more-data-better-loss direction, and the OLS fit recomputed from the
  * published slice rows.
  */
class ScalingOpsSpec extends SparkTestBase {

  test("q378: slices nest, loss falls with data, and the fit matches its own rows") {
    val rows = ScalingOps.q378ScalingLaw.fn(spark, "/root/testdata/sf0.01").collect()
      .sortBy(_.getAs[Int]("slice_sixteenths"))
    assert(rows.length == 5)
    val tokens = rows.map(_.getAs[Long]("n_tokens"))
    assert(tokens.sliding(2).forall(p => p(0) < p(1)), "nested slices must grow")
    val ppl = rows.map(_.getAs[Double]("ppl"))
    assert(ppl.sliding(2).forall(p => p(0) > p(1)),
      s"held-out ppl must fall with training data: ${ppl.mkString(",")}")
    rows.foreach(r => assert(r.getAs[Double]("ppl") > 1.0))
    val slope = rows.head.getAs[Double]("scaling_exponent")
    assert(slope < 0.0, s"scaling exponent $slope must be negative")
    // recompute the OLS from the published (n_tokens, avg_nll) rows
    val xs = tokens.map(t => math.log(t.toDouble))
    val ys = rows.map(_.getAs[Double]("avg_nll"))
    val k = xs.length
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val expSlope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(slope - expSlope) < 1e-4, s"slope $slope != recomputed $expSlope")
    val intercept = (sy - expSlope * sx) / k
    val expPpl10 = math.exp(intercept + expSlope * math.log(10.0 * tokens.last))
    assert(math.abs(rows.head.getAs[Double]("ppl_at_10x") - expPpl10) < 0.05,
      s"ppl_at_10x ${rows.head.getAs[Double]("ppl_at_10x")} != recomputed $expPpl10")
    // the extrapolation promises improvement over the full-corpus ppl
    assert(rows.head.getAs[Double]("ppl_at_10x") < ppl.last)
    // vocabulary is monotone under nesting
    val vocab = rows.map(_.getAs[Long]("vocab"))
    assert(vocab.sliding(2).forall(p => p(0) <= p(1)))
  }
}
