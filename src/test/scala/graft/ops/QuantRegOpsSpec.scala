package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the quantile-regression wave (q399): the
  * closed-form weighted-quantile solution is replayed in Scala, the
  * pinball certificate holds, and b*_τ is monotone in τ.
  */
class QuantRegOpsSpec extends SparkTestBase {

  test("q399: closed form equals replay; certificate and monotonicity hold") {
    val rows = QuantRegOps.q399QuantileRegression.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Double]("tau"))
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getAs[Boolean]("is_optimal"),
      s"tau ${r.getAs[Double]("tau")} certificate"))
    // quantile curves are monotone in tau
    assert(rows(0).getAs[Double]("b_star") <= rows(1).getAs[Double]("b_star"))
    assert(rows(1).getAs[Double]("b_star") <= rows(2).getAs[Double]("b_star"))

    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long"),
        col("l_extendedprice").cast("decimal(18,2)").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val wTot = li.map(_._3).sum
    rows.foreach { row =>
      val tau = row.getAs[Double]("tau")
      val sorted = li.map(d => (d._4 / d._3, d._1, d._2.toLong, d._3))
        .sortBy(d => (d._1, d._2, d._3))
      var cum = 0L
      val b = sorted.find { d => cum += d._4; cum >= tau * wTot }.get._1
      assert(math.abs(row.getAs[Double]("b_star") - b) < 1e-5,
        s"tau $tau: ${row.getAs[Double]("b_star")} vs replay $b")
      // pinball loss at replayed b equals the reported loss_at
      val loss = li.map { d =>
        val u = d._4 - b * d._3
        BigDecimal(u * (tau - (if (u < 0) 1.0 else 0.0))).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      assert(math.abs(row.getAs[Double]("loss_at") - loss) < 1e-2)
    }
  }
}
