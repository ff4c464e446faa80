package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the association wave: q460's partials against an
  * INDEPENDENT residual-regression definition (partial corr = corr of
  * the two residuals after regressing out the others — a different
  * algorithm from the engine's cofactor ratio), q461's concordance
  * against a brute-force pair census, and q462's information
  * inequalities (0 ≤ MI ≤ min(H), U ∈ [0, 1]).
  */
class AssocOpsSpec extends SparkTestBase {

  test("q460: cofactor partials equal residual-correlation partials") {
    val rows = AssocOps.q460PartialCorr.fn(spark, sfDir).collect()
    assert(rows.length == 6)
    // rebuild the design driver-side
    val d = RegressionOps.design(spark, sfDir).collect()
      .map(r => Array(r.getAs[Long]("y").toDouble,
        r.getAs[Long]("x1").toDouble, r.getAs[Long]("x2").toDouble,
        r.getAs[Long]("x3").toDouble))
    val n = d.length
    def residuals(target: Int, controls: Seq[Int]): Array[Double] = {
      // OLS of target on controls + intercept via Gaussian elimination
      val k = controls.length + 1
      val a = Array.fill(k, k + 1)(0.0)
      d.foreach { row =>
        val x = Array(1.0) ++ controls.map(row)
        for (i <- 0 until k) {
          for (j <- 0 until k) a(i)(j) += x(i) * x(j)
          a(i)(k) += x(i) * row(target)
        }
      }
      for (p <- 0 until k) {
        val piv = (p until k).maxBy(i => math.abs(a(i)(p)))
        val tmp = a(p); a(p) = a(piv); a(piv) = tmp
        for (i <- p + 1 until k) {
          val f = a(i)(p) / a(p)(p)
          for (j <- p to k) a(i)(j) -= f * a(p)(j)
        }
      }
      val beta = Array.fill(k)(0.0)
      for (i <- k - 1 to 0 by -1)
        beta(i) = (a(i)(k) - (i + 1 until k).map(j => a(i)(j) * beta(j)).sum) / a(i)(i)
      d.map { row =>
        val x = Array(1.0) ++ controls.map(row)
        row(target) - x.zip(beta).map { case (p, q) => p * q }.sum
      }
    }
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val (ma, mb) = (a.sum / n, b.sum / n)
      val num = a.zip(b).map { case (p, q) => (p - ma) * (q - mb) }.sum
      num / math.sqrt(a.map(p => (p - ma) * (p - ma)).sum *
        b.map(q => (q - mb) * (q - mb)).sum)
    }
    val names = Seq("price", "n_items", "sum_qty", "sum_disc_pts")
    rows.foreach { row =>
      val i = names.indexOf(row.getAs[String]("var_a"))
      val j = names.indexOf(row.getAs[String]("var_b"))
      val controls = (0 to 3).filterNot(x => x == i || x == j)
      val expected = corr(residuals(i, controls), residuals(j, controls))
      assert(math.abs(row.getAs[Double]("partial") - expected) < 1e-4,
        s"${names(i)}~${names(j)}: engine ${row.getAs[Double]("partial")} vs residual $expected")
      assert(math.abs(row.getAs[Double]("pearson")) <= 1.0)
      assert(math.abs(row.getAs[Double]("partial")) <= 1.0)
    }
  }

  test("q461: brute-force pair census agrees; inequality chain") {
    val row = AssocOps.q461OrdinalConcordance.fn(spark, sfDir).head()
    val o = Tables(spark, sfDir).orders
      .select(substring(col("o_orderpriority"), 1, 1).cast("long"),
        col("o_totalprice").cast("decimal(18,2)"), col("o_orderkey"))
      .collect()
      .map(x => (x.getLong(0), BigDecimal(x.getDecimal(1)), x.getLong(2)))
    val n = o.length
    val sorted = o.sortBy(x => (x._2, x._3)).map(_._2)
    val (c1, c2) = (sorted(n / 3 - 1), sorted(2 * n / 3 - 1))
    val pts = o.map(x => (x._1, if (x._2 <= c1) 1L else if (x._2 <= c2) 2L else 3L))
    // brute force over the 15-cell grid (equivalent to all pairs)
    val cells = pts.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    var conc = 0L; var disc = 0L
    for ((ka, ca) <- cells; (kb, cb) <- cells) {
      if (kb._1 > ka._1 && kb._2 > ka._2) conc += ca * cb
      if (kb._1 > ka._1 && kb._2 < ka._2) disc += ca * cb
    }
    assert(row.getAs[Long]("concordant") == conc)
    assert(row.getAs[Long]("discordant") == disc)
    val (g, dyx, dxy, tb) = (row.getAs[Double]("gamma"),
      row.getAs[Double]("somers_d_yx"), row.getAs[Double]("somers_d_xy"),
      row.getAs[Double]("tau_b"))
    // |gamma| >= |tau_b| >= 0; tau_b^2 = dyx * dxy (geometric-mean law)
    assert(math.abs(g) >= math.abs(tb) - 1e-9)
    assert(math.abs(tb * tb - dyx * dxy) < 1e-6, "tau-b geometric-mean law")
  }

  test("q462: information inequalities") {
    val row = AssocOps.q462TheilsU.fn(spark, sfDir).head()
    val (hx, hy, mi) = (row.getAs[Double]("h_x"), row.getAs[Double]("h_y"),
      row.getAs[Double]("mutual_info"))
    assert(hx > 0 && hx <= math.log(5.0) + 1e-9, "H(X) <= ln 5")
    assert(hy > 0 && hy <= math.log(3.0) + 1e-9, "H(Y) <= ln 3")
    assert(mi >= -1e-9 && mi <= math.min(hx, hy) + 1e-9, "0 <= MI <= min H")
    assert(row.getAs[Double]("u_y_given_x") >= -1e-9 &&
      row.getAs[Double]("u_y_given_x") <= 1.0 + 1e-9)
    assert(row.getAs[Double]("u_x_given_y") >= -1e-9 &&
      row.getAs[Double]("u_x_given_y") <= 1.0 + 1e-9)
  }
}
