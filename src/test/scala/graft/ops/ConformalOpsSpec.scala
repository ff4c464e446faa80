package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the Mondrian-conformal wave (q396): segment
  * quantiles are replayed order-statistic-by-order-statistic, and the
  * Mondrian repair property holds — per-group coverage under the
  * per-group q̂ meets the guarantee on every segment.
  */
class ConformalOpsSpec extends SparkTestBase {

  test("q396: segment q-hats match replay; Mondrian coverage holds per group") {
    val rows = ConformalOps.q396MondrianConformal.fn(spark, sfDir).collect()
    assert(rows.length >= 3, "one row per priority segment")
    // pooled q-hat identical on every row; Mondrian q-hats differ by group
    assert(rows.map(_.getAs[Double]("qhat_pooled")).distinct.length == 1)

    val t = Tables(spark, sfDir)
    val data = t.lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("x"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("x"), col("o_orderpriority"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1).toDouble, r.getString(2),
        BigDecimal(r.getDouble(3)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
    val cal = data.filter(_._1 % 2 == 0)
    val n = cal.length
    val sx = cal.map(_._2).sum; val sy = cal.map(_._4).sum
    val sxx = cal.map(d => d._2 * d._2).sum
    val sxy = cal.map(d => d._2 * d._4).sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    def resid(d: (Long, Double, String, Double)): Double =
      math.abs(d._4 - a - b * d._2)

    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      val segCal = cal.filter(_._3 == seg)
        .map(d => (resid(d), d._1)).sortBy(identity)
      val k = math.min(segCal.length,
        math.ceil((segCal.length + 1) * 0.9).toInt)
      assert(r.getAs[Long]("n_cal_seg") == segCal.length.toLong)
      assert(math.abs(r.getAs[Double]("qhat_seg") - segCal(k - 1)._1) < 1e-4,
        s"$seg qhat_seg")
      val segTest = data.filter(d => d._1 % 2 == 1 && d._3 == seg)
      val cov = segTest.count(d =>
        resid(d) <= segCal(k - 1)._1 + 1e-6).toDouble / segTest.length
      assert(math.abs(r.getAs[Double]("cov_mondrian") - cov) < 5e-3)
      // the Mondrian guarantee per group, with a binomial tolerance for
      // this fixture's small per-segment test halves (~150 orders)
      val tol = 2.5 * math.sqrt(0.9 * 0.1 / segTest.length)
      assert(r.getAs[Double]("cov_mondrian") >= 0.9 - tol,
        s"$seg conditional coverage ${r.getAs[Double]("cov_mondrian")}")
    }
  }
}
