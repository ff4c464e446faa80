package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the long-memory wave: q444's per-window R/S
  * against a driver replay (plus the H ∈ (0, 1) sanity band), q445's
  * Toeplitz–Cramer PACF against the INDEPENDENT Durbin–Levinson
  * recursion (a classical identity, so agreement is a real proof), and
  * q446's F against a driver OLS of the lagged design (plus the
  * R²-nesting law: unrestricted ≥ restricted).
  */
class LongMemoryOpsSpec extends SparkTestBase {

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def spine(): Array[Long] = {
    val counts = Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(count(lit(1)).as("c")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val (lo, hi) = (counts.keys.min, counts.keys.max)
    (lo to hi).map(t => counts.getOrElse(t, 0L)).toArray
  }

  test("q444: per-window R/S replay and Hurst band") {
    val rows = LongMemoryOps.q444HurstRs.fn(spark, sfDir).collect()
    val cs = spine()
    rows.foreach { row =>
      val w = row.getAs[Long]("w").toInt
      val blocks = cs.grouped(w).filter(_.length == w).toSeq
      val rss = blocks.flatMap { b =>
        val mean = b.sum.toDouble / w
        val devs = b.scanLeft(0L)(_ + _).tail.zipWithIndex
          .map { case (p, i) => p.toDouble - (i + 1) * mean }
        val s = math.sqrt(b.map(x => x * x).sum.toDouble / w - mean * mean)
        if (s > 0) Some(r((devs.max - devs.min) / s, 9)) else None
      }
      assert(row.getAs[Long]("n_blocks") == rss.length.toLong, s"w=$w")
      val avg = r(rss.map(BigDecimal(_)).sum.toDouble / rss.length, 9)
      assert(row.getAs[Double]("avg_rs") == r(avg, 6), s"w=$w avg")
    }
    val h = rows.head.getAs[Double]("hurst")
    assert(rows.forall(_.getAs[Double]("hurst") == h))
    assert(h > 0 && h < 1, s"Hurst $h within the R/S band")
  }

  test("q445: Toeplitz-Cramer PACF equals the Durbin-Levinson recursion") {
    val rows = LongMemoryOps.q445Pacf.fn(spark, sfDir).collect()
    assert(rows.length == 5)
    // ACF replay
    val cs = spine().map(_.toDouble)
    val n = cs.length
    val mu = cs.sum / n
    val den = cs.map(c => c * c).sum - n * mu * mu
    val acf = (1 to 5).map { k =>
      val sp = (0 until n - k).map(i => cs(i) * cs(i + k)).sum
      val sa = (0 until n - k).map(cs(_)).sum
      val sb = (k until n).map(cs(_)).sum
      r((sp - mu * (sa + sb) + (n - k) * mu * mu) / den, 9)
    }
    rows.zipWithIndex.foreach { case (row, i) =>
      assert(row.getAs[Double]("acf") == r(acf(i), 6), s"acf ${i + 1}")
    }
    // independent Durbin–Levinson on the same 9-dp ACFs
    val rho = Array(1.0) ++ acf
    var phi = Array.empty[Double]
    var v = 1.0
    val dl = (1 to 5).map { m =>
      val num = rho(m) - phi.zipWithIndex.map { case (p, j) => p * rho(m - 1 - j) }.sum
      val k = num / v
      val newPhi = phi.zipWithIndex.map { case (p, j) => p - k * phi(phi.length - 1 - j) } :+ k
      v = v * (1 - k * k)
      phi = newPhi
      k
    }
    rows.zipWithIndex.foreach { case (row, i) =>
      val got = row.getAs[Double]("pacf")
      assert(math.abs(got - dl(i)) < 1e-5,
        s"pacf lag ${i + 1}: Cramer $got vs Durbin-Levinson ${dl(i)}")
    }
    assert(rows.head.getAs[Double]("pacf") == rows.head.getAs[Double]("acf"),
      "pacf(1) == acf(1)")
  }

  test("q446: F from an independent lagged OLS; nesting law") {
    val rows = LongMemoryOps.q446GrangerCausality.fn(spark, sfDir).collect()
    assert(rows.length == 2)
    rows.foreach { row =>
      assert(row.getAs[Double]("f_stat") >= -1e-9, "F nonnegative (nesting law)")
      assert(row.getAs[Long]("df1") == 2L)
      val r2 = row.getAs[Double]("r2_unrestricted")
      assert(r2 >= 0 && r2 <= 1)
    }
    // independent replay of direction counts->revenue via Gaussian
    // elimination on the centered system
    val counts = Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(count(lit(1)).as("x"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("decimal(18,0)").cast("long").as("y")).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val (lo, hi) = (counts.keys.min, counts.keys.max)
    val xs = (lo to hi).map(t => counts.getOrElse(t, (0L, 0L))._1.toDouble).toArray
    val ys = (lo to hi).map(t => counts.getOrElse(t, (0L, 0L))._2.toDouble).toArray
    val n = xs.length
    val obs = (2 until n).map(i =>
      (ys(i), Array(ys(i - 1), ys(i - 2), xs(i - 1), xs(i - 2))))
    def sse(cols: Seq[Int]): Double = {
      val k = cols.length
      val my = obs.map(_._1).sum / obs.length
      val mz = cols.map(c => obs.map(_._2(c)).sum / obs.length)
      val a = Array.tabulate(k, k + 1)((i, j) =>
        if (j < k) obs.map(o => (o._2(cols(i)) - mz(i)) * (o._2(cols(j)) - mz(j))).sum
        else obs.map(o => (o._2(cols(i)) - mz(i)) * (o._1 - my)).sum)
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
      val syy = obs.map(o => (o._1 - my) * (o._1 - my)).sum
      val sxy = cols.indices.map(i =>
        obs.map(o => (o._2(cols(i)) - mz(i)) * (o._1 - my)).sum)
      syy - beta.zip(sxy).map { case (b, s) => b * s }.sum
    }
    val sseU = sse(Seq(0, 1, 2, 3))
    val sseR = sse(Seq(0, 1))
    val f = ((sseR - sseU) / 2) / (sseU / (obs.length - 5))
    val got = rows.find(_.getAs[String]("direction") == "counts_to_revenue").get
    assert(math.abs(got.getAs[Double]("f_stat") - f) <
      math.max(1e-3, f * 1e-3), s"F: engine ${got.getAs[Double]("f_stat")} vs replay $f")
    assert(got.getAs[Long]("n_obs") == obs.length.toLong)
  }
}
