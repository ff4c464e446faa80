package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Semantic checks for the Huber-IRLS wave (q418): the full iteration
  * is replayed in Scala with exact BigDecimal weighted moments, and the
  * robustness laws hold (downweighting kicks in, weights cap at 1).
  */
class HuberOpsSpec extends SparkTestBase {

  private def rd(x: Double, k: Int) =
    BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q418: exact BigDecimal replay of all three IRLS rounds") {
    val out = HuberOps.q418HuberIrls.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("iter") -> r).toMap
    assert(out.size == 4)

    val daily = Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast("double").as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val n = daily.length

    def fit(w: Map[Long, Double]): (Double, Double, Double, Long) = {
      def bd(x: Double) = BigDecimal(x)
      var (sw, swx, swy, swxx, swxy) =
        (BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0))
      var nDown = 0L
      daily.foreach { case (t, y) =>
        val wi = bd(w(t)).setScale(9)
        val td = bd(t.toDouble)
        val yd = bd(y).setScale(2)
        sw += wi; swx += wi * td; swy += wi * yd
        swxx += wi * td * td; swxy += wi * yd * td
        if (w(t) < 1.0) nDown += 1
      }
      val b = rd((sw.toDouble * swxy.toDouble - swx.toDouble * swy.toDouble) /
        (sw.toDouble * swxx.toDouble - swx.toDouble * swx.toDouble), 6)
      val a = rd((swy.toDouble - b * swx.toDouble) / sw.toDouble, 4)
      (a, b, rd(sw.toDouble, 4), nDown)
    }

    var w = daily.map(d => d._1 -> 1.0).toMap
    var (a, b, sw, nd) = fit(w)
    assert(out(0L).getAs[Double]("a") == a && out(0L).getAs[Double]("b") == b)
    assert(out(0L).getAs[Long]("n_down") == 0L)
    for (i <- 1L to 3L) {
      val r = daily.map { case (t, y) =>
        (t, rd(math.abs(y - a - b * t), 2)) }
      val s0 = r.map(x => (x._2, x._1)).sorted.apply(((n + 1) / 2) - 1)._1
      w = r.map { case (t, ri) =>
        t -> rd(math.min(1.0, 1.345 * s0 / math.max(ri, 0.01)), 9) }.toMap
      val f = fit(w)
      a = f._1; b = f._2; sw = f._3; nd = f._4
      val row = out(i)
      assert(row.getAs[Double]("scale_s") == s0, s"scale at $i")
      assert(row.getAs[Double]("a") == a, s"a at $i")
      assert(row.getAs[Double]("b") == b, s"b at $i")
      assert(row.getAs[Double]("sum_w") == sw, s"sum_w at $i")
      assert(row.getAs[Long]("n_down") == nd, s"n_down at $i")
    }
    assert(out(3L).getAs[Long]("n_down") > 0, "some days get downweighted")
    assert(out(3L).getAs[Double]("sum_w") < n, "weight mass strictly drops")
  }
}
