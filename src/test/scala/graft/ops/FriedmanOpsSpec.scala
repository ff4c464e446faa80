package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the Friedman wave (q434): exact within-block
  * midrank replay of χ² and Kendall's W, plus the rank-mass law
  * Σ_j R_j = n·k(k+1)/2.
  */
class FriedmanOpsSpec extends SparkTestBase {

  test("q434: within-block midrank replay and rank-mass conservation") {
    val rows = FriedmanOps.q434FriedmanTest.fn(spark, sfDir).collect()
    assert(rows.length == 5, "five treatments")
    val k = rows.length
    val n = rows.head.getAs[Long]("n_blocks")
    assert(rows.forall(_.getAs[Long]("n_blocks") == n), "complete blocks")
    val rankMass = rows.map(_.getAs[Double]("rank_sum")).sum
    assert(rankMass == n.toDouble * k * (k + 1) / 2, "rank mass conservation")
    assert(rows.map(_.getAs[Double]("chi2")).distinct.length == 1)
    val w = rows.head.getAs[Double]("kendall_w")
    assert(w >= 0 && w <= 1)

    // replay: blocks = months, within-block midranks over exact sums
    val cells = Tables(spark, sfDir).orders
      .groupBy(date_trunc("month", col("o_orderdate")).as("blk"),
        col("o_orderpriority").as("trt"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("v"))
      .collect()
      .map(r => (r.get(0).toString, r.getString(1), BigDecimal(r.getDecimal(2))))
    val byBlk = cells.groupBy(_._1).filter(_._2.length == k)
    assert(byBlk.size.toLong == n)
    val sr2 = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    var tie3 = 0L
    byBlk.values.foreach { xs =>
      val sorted = xs.map(_._3).sorted
      val firstRank = sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, ys) => v -> (ys.map(_._2).min + 1) }
      val cnt = xs.map(_._3).groupBy(identity).map { case (v, ys) => v -> ys.length }
      xs.foreach { case (_, trt, v) =>
        sr2(trt) += 2L * firstRank(v) + cnt(v) - 1 }
      tie3 += cnt.values.map(t => t.toLong * t * t - t).sum
    }
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val nn = n.toDouble; val kk = k.toDouble
    val ssdev = sr2.values.map { s =>
      BigDecimal(r6((s - nn * (kk + 1)) * (s - nn * (kk + 1)) / 4)) }.sum.toDouble
    val denom = nn * kk * (kk + 1) / 12 - tie3.toDouble / (12 * (kk - 1))
    val chi2 = r6(ssdev / denom)
    assert(rows.head.getAs[Double]("chi2") == chi2)
    assert(rows.head.getAs[Double]("kendall_w") == r6(chi2 / (nn * (kk - 1))))
    rows.foreach { row =>
      assert(row.getAs[Double]("rank_sum") ==
        sr2(row.getAs[String]("trt")).toDouble / 2)
    }
  }
}
