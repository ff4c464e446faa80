package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the periodogram wave (q426): exact scaled-long
  * replay of every period's trig sums, power identity, and exactly one
  * dominant period.
  */
class PeriodOpsSpec extends SparkTestBase {

  test("q426: exact trig-sum replay; power identity; one dominant") {
    val rows = PeriodOps.q426Periodogram.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("period")).toSeq ==
      Seq(3L, 5L, 7L, 14L, 30L, 91L, 365L))
    assert(rows.count(_.getAs[Boolean]("is_dominant")) == 1)
    rows.foreach { r =>
      val (c, sVal) = (r.getAs[Double]("c"), r.getAs[Double]("s"))
      assert(r.getAs[Double]("power") == c * c + sVal * sVal)
      assert(r.getAs[Double]("var_share") >= 0 &&
        r.getAs[Double]("var_share") <= 1.0 + 1e-9)
    }
    val dom = rows.filter(_.getAs[Boolean]("is_dominant")).head
    rows.foreach(r => assert(r.getAs[Double]("power") <=
      dom.getAs[Double]("power")))

    val daily = Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(count(lit(1)).cast("double").as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val n = daily.length
    val mu = BigDecimal(daily.map(_._2.toLong).sum.toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val twoPi = 6.283185307179586
    def r2(x: Double) = BigDecimal(x).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val p = r.getAs[Long]("period")
      val cSum = daily.map { case (t, y) =>
        math.round((y - mu) * math.cos(twoPi * (t % p) / p) * 100) }.sum
      val sSum = daily.map { case (t, y) =>
        math.round((y - mu) * math.sin(twoPi * (t % p) / p) * 100) }.sum
      assert(r.getAs[Double]("c") == r2(cSum.toDouble / 100), s"c at $p")
      assert(r.getAs[Double]("s") == r2(sSum.toDouble / 100), s"s at $p")
    }
  }
}
