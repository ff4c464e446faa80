package graft.ops

import graft.SparkTestBase

/** Semantic laws for the series & ranking wave (q334–q337): rank-list
  * shape, variance decomposition, split accounting, and the τ-b
  * identity.
  */
class SeriesOpsSpec extends SparkTestBase {

  test("textrank: ten keywords, positive scores in rank order") {
    val rows = SeriesOps.q334TextrankKeywords.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[String]("token"),
        r.getAs[Double]("score"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    assert(rows.forall(_._3 > 0))
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 <= a._3 + 1e-9 },
      "scores not descending with rank")
    assert(rows.map(_._2).distinct.length == 10)
  }

  test("stl: orthogonal decomposition — removing a component only sheds variance") {
    val r = SeriesOps.q335StlDecomposition.fn(spark, sfDir).collect()(0)
    val (vt, vtr, vr) = (r.getAs[Double]("var_total"), r.getAs[Double]("var_trend"),
      r.getAs[Double]("var_remainder"))
    assert(vt > 0 && vtr >= 0 && vr >= 0)
    assert(vr <= vt + 1e-6)
    val (ts, ss) = (r.getAs[Double]("trend_share"), r.getAs[Double]("seasonal_share"))
    // seasonal means are orthogonal to the remainder by construction
    assert(ss >= -1e-6, s"seasonal share $ss negative — orthogonality broken")
    assert(ts + ss <= 1.0 + 1e-6)
  }

  test("binseg: split partitions the spine, gain recomputes from the segment means") {
    val r = SeriesOps.q336BinsegChangepoint.fn(spark, sfDir).collect()(0)
    val (nl, nr) = (r.getAs[Long]("n_left"), r.getAs[Long]("n_right"))
    assert(nl >= 1 && nr >= 1)
    val days = Tables(spark, sfDir).orders
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate"))).distinct().count()
    assert(nl + nr == days)
    val (ml, mr, g) = (r.getAs[Double]("mean_left"), r.getAs[Double]("mean_right"),
      r.getAs[Double]("gain"))
    val expected = nl.toDouble * nr / (nl + nr) * (ml - mr) * (ml - mr)
    assert(g >= 0 && math.abs(g - expected) < math.max(1e-3, expected * 1e-4))
  }

  test("kendall tau: bounded, identity holds, pairs account") {
    val r = SeriesOps.q337KendallTau.fn(spark, sfDir).collect()(0)
    val (n, c, d) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("concordant"),
      r.getAs[Long]("discordant"))
    val (tr, tq, tau) = (r.getAs[Long]("ties_rev"), r.getAs[Long]("ties_qty"),
      r.getAs[Double]("tau"))
    assert(c + d <= n && tr <= n && tq <= n)
    assert(tau >= -1 && tau <= 1)
    val expected = (c - d).toDouble / math.sqrt((n - tr).toDouble * (n - tq))
    assert(math.abs(tau - expected) < 1e-5)
  }
}
