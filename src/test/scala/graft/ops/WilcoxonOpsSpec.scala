package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the Wilcoxon wave (q430): exact midrank replay
  * of W⁺ and the rank-mass conservation law W⁺ + W⁻ = n(n+1)/2.
  */
class WilcoxonOpsSpec extends SparkTestBase {

  test("q430: midrank replay, conservation, tie-corrected z") {
    val row = WilcoxonOps.q430WilcoxonSignedRank.fn(spark, sfDir).collect().head
    val n = row.getAs[Long]("n_used")
    assert(n > 100, "the era split must produce a real pair population")
    assert(row.getAs[Long]("n_pos") + row.getAs[Long]("n_neg") == n)
    val wp = row.getAs[Double]("w_plus"); val wn = row.getAs[Double]("w_neg")
    assert(wp + wn == n.toDouble * (n + 1) / 2, "rank mass conservation")

    // replay from the raw pairs
    val pairs = Tables(spark, sfDir).orders
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("o_orderdate") < lit("1998-04-01"),
          col("o_totalprice").cast("decimal(18,2)"))).as("pre"),
        sum(when(col("o_orderdate") >= lit("1998-04-01"),
          col("o_totalprice").cast("decimal(18,2)"))).as("post"))
      .where(col("pre").isNotNull && col("post").isNotNull)
      .collect().map(r => BigDecimal(r.getDecimal(2)) - BigDecimal(r.getDecimal(1)))
    assert(pairs.length == row.getAs[Long]("n_pairs"))
    val nz = pairs.filter(_ != 0)
    val absSorted = nz.map(_.abs).sorted
    val firstRank = absSorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2).min + 1) }
    val cnt = nz.map(_.abs).groupBy(identity).map { case (v, xs) => v -> xs.length }
    val w2p = nz.filter(_ > 0)
      .map(d => 2L * firstRank(d.abs) + cnt(d.abs) - 1).sum
    assert(wp == w2p.toDouble / 2, "exact W+ replay")
    val tie3 = cnt.values.map(t => t.toLong * t * t - t).sum
    val nn = nz.length.toDouble
    val sigma = math.sqrt(nn * (nn + 1) * (2 * nn + 1) / 24 - tie3 / 48.0)
    val mu = nn * (nn + 1) / 4
    val cc = if (wp > mu) 0.5 else if (wp < mu) -0.5 else 0.0
    val z = BigDecimal((wp - mu - cc) / sigma)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("z") == z)
    assert(row.getAs[Boolean]("reject_5pct") == (math.abs(z) > 1.959963984540054))
  }
}
