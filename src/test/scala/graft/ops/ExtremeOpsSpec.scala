package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Semantic checks for the Gumbel wave (q423): closed-form replay from
  * the block-maxima census, return-level monotonicity, and a sane
  * 12-month exceedance calibration.
  */
class ExtremeOpsSpec extends SparkTestBase {

  private def r6(x: Double) = BigDecimal(x).setScale(6,
    BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q423: MoM replay, return-level monotonicity, calibration") {
    val r = ExtremeOps.q423GumbelReturnLevels.fn(spark, sfDir).head()
    assert(r.getAs[Double]("rl_12") < r.getAs[Double]("rl_60"))
    assert(r.getAs[Double]("rl_60") < r.getAs[Double]("rl_120"))
    assert(r.getAs[Double]("beta") > 0)

    val mx = Tables(spark, sfDir).orders
      .groupBy(col("o_orderdate").as("d"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
      .groupBy((year(col("d")) * 12 + month(col("d")) - 1).cast("long").as("b"))
      .agg(max(col("rev")).cast("double").as("mx"))
      .collect().map(_.getAs[Double]("mx"))
    val n = mx.length
    assert(r.getAs[Long]("n_blocks") == n.toLong)
    val mean = r6(mx.map(BigDecimal(_)).sum.toDouble / n)
    val sd = r6(math.sqrt(mx.map(m => BigDecimal(m) * BigDecimal(m)).sum.toDouble / n -
      mean * mean))
    assert(r.getAs[Double]("mean_max") == mean)
    assert(r.getAs[Double]("sd_max") == sd)
    val beta = r6(sd * math.sqrt(6.0) / math.Pi)
    val mu = r6(mean - 0.5772156649015329 * beta)
    assert(r.getAs[Double]("beta") == beta && r.getAs[Double]("mu") == mu)
    def rl(t: Double) = r6(mu - beta * math.log(-math.log(1.0 - 1.0 / t)))
    assert(r.getAs[Double]("rl_12") == rl(12))
    assert(r.getAs[Double]("rl_120") == rl(120))
    val exceed = mx.count(_ > rl(12))
    assert(r.getAs[Long]("n_exceed_rl12") == exceed.toLong)
    // a 1-in-12-block level should be exceeded by roughly n/12 blocks
    assert(exceed >= 1 && exceed <= n / 3, s"calibration: $exceed of $n")
  }
}
