package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for wave q463–q465: CMH/MH replays from driver-side
  * strata (plus the OR-between-strata sandwich law), Stuart–Maxwell via
  * an INDEPENDENT Gaussian-elimination solve of d′S⁻¹d, and Cramér's V
  * bounds with corrected ≤ raw.
  */
class StratifiedAssocOpsSpec extends SparkTestBase {

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q463: MH replay and the common-OR sandwich law") {
    val rows = StratifiedAssocOps.q463MantelHaenszel.fn(spark, sfDir).collect()
    assert(rows.length == 5)
    val cells = rows.map(x => (x.getAs[Long]("a"), x.getAs[Long]("b"),
      x.getAs[Long]("c"), x.getAs[Long]("d")))
    val sAd = cells.map { case (a, b, c, d) =>
      BigDecimal(r(a.toDouble * d / (a + b + c + d), 9)) }.sum.toDouble
    val sBc = cells.map { case (a, b, c, d) =>
      BigDecimal(r(b.toDouble * c / (a + b + c + d), 9)) }.sum.toDouble
    val orMh = r(sAd / sBc, 6)
    assert(rows.head.getAs[Double]("or_mh") == orMh)
    // sandwich: the common OR lies within the stratum ORs' range
    val ors = rows.flatMap(x => Option(x.getAs[java.lang.Double]("or_stratum"))
      .map(_.doubleValue))
    assert(orMh >= ors.min - 1e-9 && orMh <= ors.max + 1e-9,
      s"MH OR $orMh within [${ors.min}, ${ors.max}]")
    // CMH replay
    val sa = cells.map(_._1).sum.toDouble
    val se = cells.map { case (a, b, c, d) =>
      BigDecimal(r((a + b).toDouble * (a + c) / (a + b + c + d), 9)) }
      .sum.toDouble
    val sv = cells.map { case (a, b, c, d) =>
      val n = (a + b + c + d).toDouble
      BigDecimal(r((a + b) * (c + d).toDouble * (a + c) * (b + d)
        / (n * n * (n - 1)), 9)) }.sum.toDouble
    val cmh = r((math.abs(sa - se) - 0.5) * (math.abs(sa - se) - 0.5) / sv, 6)
    assert(rows.head.getAs[Double]("cmh_chi2") == cmh)
  }

  test("q464: quadratic form equals an independent linear solve") {
    val row = StratifiedAssocOps.q464StuartMaxwell.fn(spark, sfDir).head()
    // rebuild the transition grid driver-side
    val o = Tables(spark, sfDir).orders
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"),
        substring(col("o_orderpriority"), 1, 1).cast("long"),
        col("o_orderkey")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val grid = Array.fill(6, 6)(0L)
    var nPairs = 0L
    o.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(x => (x._2, x._4))
      if (sorted.length >= 2) {
        grid(sorted(0)._3.toInt)(sorted(1)._3.toInt) += 1
        nPairs += 1
      }
    }
    assert(row.getAs[Long]("n_pairs") == nPairs)
    val d = (1 to 4).map(i =>
      ((1 to 5).map(j => grid(i)(j)).sum - (1 to 5).map(j => grid(j)(i)).sum)
        .toDouble).toArray
    (1 to 4).foreach(i =>
      assert(row.getAs[Long](s"d$i") == d(i - 1).toLong))
    val sM = Array.tabulate(4, 4) { (ii, jj) =>
      val (i, j) = (ii + 1, jj + 1)
      if (i == j)
        ((1 to 5).map(k => grid(i)(k)).sum + (1 to 5).map(k => grid(k)(i)).sum
          - 2 * grid(i)(i)).toDouble
      else -(grid(i)(j) + grid(j)(i)).toDouble
    }
    // solve S x = d by Gaussian elimination; chi2 = d . x
    val a = sM.zipWithIndex.map { case (rw, i) => rw :+ d(i) }
    for (p <- 0 until 4) {
      val piv = (p until 4).maxBy(i => math.abs(a(i)(p)))
      val tmp = a(p); a(p) = a(piv); a(piv) = tmp
      for (i <- p + 1 until 4) {
        val f = a(i)(p) / a(p)(p)
        for (j <- p to 4) a(i)(j) -= f * a(p)(j)
      }
    }
    val x = Array.fill(4)(0.0)
    for (i <- 3 to 0 by -1)
      x(i) = (a(i)(4) - (i + 1 until 4).map(j => a(i)(j) * x(j)).sum) / a(i)(i)
    val chi2 = d.zip(x).map { case (p, q) => p * q }.sum
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-4,
      s"engine ${row.getAs[Double]("chi2")} vs solve $chi2")
    assert(row.getAs[Double]("chi2") >= 0)
  }

  test("q465: V bounds and corrected <= raw") {
    val row = StratifiedAssocOps.q465CramersV.fn(spark, sfDir).head()
    val (vr, vc) = (row.getAs[Double]("v_raw"), row.getAs[Double]("v_corrected"))
    assert(vr >= 0 && vr <= 1)
    assert(vc >= 0 && vc <= 1)
    assert(vc <= vr + 1e-9, "bias correction only shrinks")
    assert(row.getAs[Long]("n_regions") == 5L)
    assert(row.getAs[Long]("n_priorities") == 5L)
    assert(row.getAs[Double]("chi2") >= 0)
  }
}
