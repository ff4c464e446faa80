package graft.ops

import graft.SparkTestBase

/** Semantic checks for the V-optimal wave (q402): the DP's 4-bucket
  * partition is verified OPTIMAL by exhausting all C(31,3) = 4495
  * boundary triples, and it never loses to the heuristics.
  */
class HistogramOpsSpec extends SparkTestBase {

  test("q402: DP partition is exhaustively optimal and beats heuristics") {
    val rows = HistogramOps.q402VoptHistogram.fn(spark, sfDir).collect()
    assert(rows.length == 12, "3 schemes x 4 buckets")
    def total(scheme: String): Double =
      rows.filter(_.getAs[String]("scheme") == scheme)
        .map(_.getAs[Double]("sse")).sum
    val vopt = total("v_optimal")
    assert(vopt <= total("equi_width") + 1e-6)
    assert(vopt <= total("equi_depth") + 1e-6)

    // rebuild the census the query used and exhaust all partitions
    val o = Tables(spark, sfDir).orders
      .select(org.apache.spark.sql.functions.col("o_totalprice")).collect()
      .map(_.getDouble(0))
    val maxv = o.max
    val counts = new Array[Long](32)
    o.foreach(v => counts(math.min(31, (v * 32.0 / (maxv + 1.0)).toInt)) += 1)
    val n = counts.scanLeft(0L)(_ + _)
    val sp = counts.zipWithIndex.scanLeft(0L) { case (a, (c, p)) => a + c * p }
    val qp = counts.zipWithIndex.scanLeft(0L) { case (a, (c, p)) => a + c * p * p }
    def sse(j: Int, i: Int): Double = {
      val c = n(i) - n(j)
      if (c == 0) 0.0
      else (qp(i) - qp(j)).toDouble -
        (sp(i) - sp(j)).toDouble * (sp(i) - sp(j)).toDouble / c
    }
    var best = Double.MaxValue
    for (a <- 1 to 29; b <- (a + 1) to 30; c <- (b + 1) to 31) {
      val t = sse(0, a) + sse(a, b) + sse(b, c) + sse(c, 32)
      if (t < best) best = t
    }
    assert(math.abs(vopt - best) < 1e-3,
      s"DP total $vopt vs exhaustive optimum $best")
  }
}
