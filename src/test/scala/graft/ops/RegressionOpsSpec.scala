package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the regression wave: q441's coefficients against
  * a driver-side Gaussian-elimination solve of the same exact normal
  * equations (agreement to the conditioning budget, R² laws), q442's
  * VIF ≥ 1 law plus the R²-vs-VIF identity, and q443's BP against the
  * fitted-vs-squared-residual mechanics (R²_aux ∈ [0,1], BP = n·R²).
  */
class RegressionOpsSpec extends SparkTestBase {

  private def fetchDesign(): Array[(Double, Double, Double, Double)] = {
    val li = Tables(spark, sfDir).lineitem
      .groupBy(col("l_orderkey").as("ok"))
      .agg(count(lit(1)).as("x1"),
        sum(col("l_quantity").cast("long")).as("x2"),
        sum(round(col("l_discount") * 100).cast("long")).as("x3"))
    Tables(spark, sfDir).orders
      .select(col("o_orderkey").as("ok"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long").as("y"))
      .join(li, Seq("ok")).collect()
      .map(r => (r.getAs[Long]("y").toDouble, r.getAs[Long]("x1").toDouble,
        r.getAs[Long]("x2").toDouble, r.getAs[Long]("x3").toDouble))
  }

  /** Solve the 4×4 normal equations by Gaussian elimination with
    * partial pivoting — an INDEPENDENT algorithm from the engine's
    * Cramer expansion. */
  private def olsSolve(d: Array[(Double, Double, Double, Double)]): Array[Double] = {
    val xs = d.map { case (y, a, b, c) => (Array(1.0, a, b, c), y) }
    val ata = Array.fill(4, 5)(0.0)
    xs.foreach { case (x, y) =>
      for (i <- 0 until 4) {
        for (j <- 0 until 4) ata(i)(j) += x(i) * x(j)
        ata(i)(4) += x(i) * y
      }
    }
    for (p <- 0 until 4) {
      val piv = (p until 4).maxBy(i => math.abs(ata(i)(p)))
      val tmp = ata(p); ata(p) = ata(piv); ata(piv) = tmp
      for (i <- p + 1 until 4) {
        val f = ata(i)(p) / ata(p)(p)
        for (j <- p to 4) ata(i)(j) -= f * ata(p)(j)
      }
    }
    val beta = Array.fill(4)(0.0)
    for (i <- 3 to 0 by -1) {
      beta(i) = (ata(i)(4) - (i + 1 until 4).map(j => ata(i)(j) * beta(j)).sum) / ata(i)(i)
    }
    beta
  }

  test("q441: Cramer solve matches independent Gaussian elimination; R² laws") {
    val rows = RegressionOps.q441MultipleRegression.fn(spark, sfDir).collect()
    assert(rows.length == 4)
    val d = fetchDesign()
    val beta = olsSolve(d) // cents space
    val byName = rows.map(r => r.getAs[String]("coef") -> r).toMap
    val expect = Map("intercept" -> beta(0), "n_items" -> beta(1),
      "sum_qty" -> beta(2), "sum_disc_pts" -> beta(3))
    expect.foreach { case (nm, b) =>
      val got = byName(nm).getAs[Double]("beta") * 100 // back to cents
      assert(math.abs(got - b) <= math.max(1e-6, math.abs(b) * 1e-6),
        s"$nm: engine $got vs elimination $b")
    }
    val r2 = rows.head.getAs[Double]("r2")
    val adj = rows.head.getAs[Double]("adj_r2")
    assert(r2 >= 0 && r2 <= 1 && adj <= r2)
    // residual replay: R² from the fitted betas agrees
    val sse = d.map { case (y, a, b, c) =>
      val e = y - beta(0) - beta(1) * a - beta(2) * b - beta(3) * c; e * e
    }.sum
    val my = d.map(_._1).sum / d.length
    val sst = d.map(x => (x._1 - my) * (x._1 - my)).sum
    assert(math.abs(r2 - (1 - sse / sst)) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Double]("se") > 0)
      val t = r.getAs[Double]("t_stat")
      assert(math.abs(t - r.getAs[Double]("beta") / r.getAs[Double]("se")) < 0.02,
        "t is beta/se up to the rounding of each")
    }
  }

  test("q442: VIF identity and bounds") {
    val rows = RegressionOps.q442Vif.fn(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2_aux")
      val vif = r.getAs[Double]("vif")
      assert(r2 >= 0 && r2 < 1)
      assert(vif >= 1.0, "VIF >= 1 law")
      assert(math.abs(vif - 1.0 / (1.0 - r2)) < 1e-4, "VIF identity")
    }
    // quantity and item count are mechanically collinear in this design:
    // their VIF must exceed the discount regressor's
    val byF = rows.map(r => r.getAs[String]("feature") ->
      r.getAs[Double]("vif")).toMap
    assert(byF("n_items") > byF("sum_disc_pts"))
    assert(byF("sum_qty") > byF("sum_disc_pts"))
  }

  test("q443: BP = n * R2_aux, bounds, verdict consistency") {
    val row = RegressionOps.q443BreuschPagan.fn(spark, sfDir).head()
    val n = row.getAs[Long]("n")
    val r2 = row.getAs[Double]("r2_aux")
    val bp = row.getAs[Double]("bp_stat")
    assert(r2 >= 0 && r2 <= 1)
    assert(math.abs(bp - n * r2) < 1e-3)
    assert(row.getAs[Long]("df") == 3L)
    assert(row.getAs[Boolean]("reject_5pct") == (bp > 7.814727903251179))
    // the design has 150+ orders even at sf0.001
    assert(n > 100)
  }
}
