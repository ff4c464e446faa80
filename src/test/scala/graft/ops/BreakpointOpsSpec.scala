package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Semantic checks for the segmented-trend wave (q408): the winning
  * breakpoint is replayed by brute-force two-piece OLS in Scala, and the
  * two-piece fit certificate (sse2 <= sse1) holds.
  */
class BreakpointOpsSpec extends SparkTestBase {

  private def ols(pts: Seq[(Double, Double)]): (Double, Double) = {
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum
    val sy = pts.map(p => BigDecimal(p._2).setScale(4,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => BigDecimal(p._2 * p._1).setScale(4,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val syy = pts.map(p => BigDecimal(p._2 * p._2).setScale(4,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val sxxc = n * sxx - sx * sx
    val b = (n * sxy - sx * sy) / sxxc
    ((n * syy - sy * sy) / n - b * b * sxxc / n, b)
  }

  test("q408: brute-force two-piece OLS agrees with the one-shuffle sweep") {
    val row = BreakpointOps.q408TrendBreakpoint.fn(spark, sfDir).head()
    val sse2 = row.getAs[Double]("sse_two_piece")
    val sse1 = row.getAs[Double]("sse_single")
    assert(sse2 <= sse1, "two-piece fit can never be worse than one line")
    assert(row.getAs[Double]("sse_drop") >= 0 &&
      row.getAs[Double]("sse_drop") <= 1)

    // replay: monthly spine, then every candidate k via direct OLS
    val monthly = Tables(spark, sfDir).orders
      .withColumn("m", (year(col("o_orderdate")) * 12 +
        month(col("o_orderdate")) - 1).cast("long"))
      .groupBy(col("m"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast("double").as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(_._1)
    val m0 = monthly.map(_._1).min
    val pts = monthly.map { case (m, y) => ((m - m0).toDouble, y) }
    val nM = pts.length
    val best = (2 to nM - 3).map { k =>
      val (l, bl) = ols(pts.filter(_._1 <= k).toSeq)
      val (r, br) = ols(pts.filter(_._1 > k).toSeq)
      (BigDecimal(l + r).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, k.toLong, bl, br)
    }.minBy(t => (t._1, t._2))
    assert(row.getAs[Long]("break_month") == best._2)
    assert(math.abs(sse2 - best._1) < 1e-6)
    assert(math.abs(row.getAs[Double]("slope_before") -
      BigDecimal(best._3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    assert(math.abs(row.getAs[Double]("slope_after") -
      BigDecimal(best._4).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
  }
}
