package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Semantic checks for the Holt wave (q411): the smoothing recursion is
  * replayed literally in Scala and every level/trend/forecast must
  * match; the MASE and next-month forecast follow from the replay.
  */
class ForecastOpsSpec extends SparkTestBase {

  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q411: literal Holt recursion replay matches every row") {
    val rows = ForecastOps.q411HoltSmoothing.fn(spark, sfDir).collect()
    assert(rows.length > 24, "monthly spine expected")

    val monthly = Tables(spark, sfDir).orders
      .withColumn("m", (year(col("o_orderdate")) * 12 +
        month(col("o_orderdate")) - 1).cast("long"))
      .groupBy(col("m"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast("double").as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val y = monthly.map(_._2)
    var l = y(0)
    var b = r4(y(1) - y(0))
    val states = Array.ofDim[(Double, Double, Double)](y.length) // (l,b,fc)
    states(0) = (l, Double.NaN, Double.NaN)
    for (t <- 1 until y.length) {
      val fc = r4(l + b)
      val ln = r4(0.5 * y(t) + 0.5 * fc)
      b = r4(0.5 * (ln - l) + 0.5 * b)
      l = ln
      states(t) = (l, b, fc)
    }
    rows.foreach { r =>
      val t = r.getAs[Long]("t").toInt
      assert(r.getAs[Double]("y") == y(t))
      assert(r.getAs[Double]("level") == states(t)._1, s"level at $t")
      if (t == 0) {
        assert(r.isNullAt(r.fieldIndex("trend")) &&
          r.isNullAt(r.fieldIndex("fc")))
      } else {
        assert(r.getAs[Double]("trend") == states(t)._2, s"trend at $t")
        assert(r.getAs[Double]("fc") == states(t)._3, s"fc at $t")
      }
      assert(r.getAs[Double]("fc_next") == r4(l + b))
    }
    // MASE replay: sum |err| / sum |naive diff| over t >= 1
    val num = (1 until y.length).map(t => BigDecimal(r4(math.abs(y(t) - states(t)._3)))).sum
    val den = (1 until y.length).map(t => BigDecimal(r4(math.abs(y(t) - y(t - 1))))).sum
    val mase = BigDecimal((num / den).toDouble).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rows.head.getAs[Double]("mase") - mase) < 2e-6)
    assert(mase > 0 && mase < 2, "Holt should be in the naive forecaster's league")
  }
}
