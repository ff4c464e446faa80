package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the series-diagnostics wave: Ljung–Box (q438)
  * against a driver ACF replay on the zero-filled spine, the runs test
  * (q439) against an exact run-count replay, and Durbin–Watson (q440)
  * against the OLS + residual-walk identity — plus the family laws
  * (|acf| ≤ 1, Q monotone in the lag, DW ∈ [0, 4], runs ≤ n).
  */
class SeriesDiagOpsSpec extends SparkTestBase {

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def dailySeries(): Array[(Long, Long)] = {
    val counts = Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(count(lit(1)).as("c")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val (lo, hi) = (counts.keys.min, counts.keys.max)
    (lo to hi).map(t => t -> counts.getOrElse(t, 0L)).toArray
  }

  test("q438: ACF replay on the zero-filled spine, Q monotone, laws") {
    val rows = SeriesDiagOps.q438LjungBox.fn(spark, sfDir).collect()
    assert(rows.length == 10)
    val series = dailySeries()
    val n = series.length.toLong
    val cs = series.map(_._2)
    val s = cs.sum
    val s2 = cs.map(c => c * c).sum
    val mu = s.toDouble / n
    (1 to 10).foreach { k =>
      val pairs = (0 until (n - k).toInt).map(i => (cs(i), cs(i + k)))
      val sp = pairs.map { case (a, b) => a * b }.sum
      val sa = pairs.map(_._1).sum
      val sb = pairs.map(_._2).sum
      val acf = r((sp - mu * (sa + sb) + pairs.length * mu * mu) /
        (s2 - n * mu * mu), 9)
      val row = rows(k - 1)
      assert(row.getAs[Long]("lag") == k.toLong)
      assert(row.getAs[Long]("n_pairs") == n - k)
      assert(row.getAs[Double]("acf") == acf, s"acf lag $k")
      assert(math.abs(acf) <= 1.0)
    }
    // replay the cumulative Q with the engine's rounding discipline
    val acfs = rows.map(_.getAs[Double]("acf"))
    var cum = BigDecimal(0)
    (1 to 10).foreach { k =>
      cum += BigDecimal(r(acfs(k - 1) * acfs(k - 1) / (n - k), 15))
      assert(rows(k - 1).getAs[Double]("q_lb") ==
        r(n * (n + 2) * cum.toDouble, 6))
    }
    val qs = rows.map(_.getAs[Double]("q_lb"))
    assert(qs.zip(qs.tail).forall { case (a, b) => b >= a }, "Q monotone")
    assert(rows.take(9).forall(_.isNullAt(rows.head.fieldIndex("p_value"))))
    val p10 = rows(9).getAs[Double]("p_value")
    assert(p10 >= 0 && p10 <= 1)
  }

  test("q439: exact run-count replay and moment identities") {
    val row = SeriesDiagOps.q439RunsTest.fn(spark, sfDir).head()
    val daily = Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("v")).collect()
      .map(x => (x.getLong(0), BigDecimal(x.getDecimal(1))))
      .sortBy(_._1)
    val n = daily.length
    assert(row.getAs[Long]("n_days") == n.toLong)
    // lower median: element at rank (n+1)/2 of (v, t) order
    val med = daily.sortBy(x => (x._2, x._1)).apply((n + 1) / 2 - 1)._2
    val signs = daily.filter(_._2 != med).map(_._2 > med)
    assert(row.getAs[Long]("n_used") == signs.length.toLong)
    assert(row.getAs[Long]("n_above") == signs.count(identity).toLong)
    assert(row.getAs[Long]("n_below") == signs.count(!_).toLong)
    val runs = 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
    assert(row.getAs[Long]("n_runs") == runs)
    val (n1, n2) = (signs.count(identity).toDouble, signs.count(!_).toDouble)
    val m = signs.length.toDouble
    val e = 2 * n1 * n2 / m + 1
    val v = 2 * n1 * n2 * (2 * n1 * n2 - m) / (m * m * (m - 1))
    assert(row.getAs[Double]("e_runs") == r(e, 6))
    assert(row.getAs[Double]("var_runs") == r(v, 6))
    val cc = if (runs > e) 0.5 else if (runs < e) -0.5 else 0.0
    assert(row.getAs[Double]("z") == r((runs - e - cc) / math.sqrt(v), 6))
    assert(runs <= signs.length, "runs bounded by series length")
  }

  test("q440: OLS + residual-walk replay, DW in [0, 4]") {
    val row = SeriesDiagOps.q440DurbinWatson.fn(spark, sfDir).head()
    val daily = Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("v")).collect()
      .map(x => (x.getLong(0), BigDecimal(x.getDecimal(1))))
      .sortBy(_._1)
    val n = daily.length.toLong
    assert(row.getAs[Long]("n_days") == n)
    val st = daily.map(_._1).sum
    val stt = daily.map(x => x._1 * x._1).sum
    val sy = daily.map(_._2).sum
    val sty = daily.map(x => x._2 * BigDecimal(x._1)).sum
    val slope = r((n * sty.toDouble - st.toDouble * sy.toDouble) /
      (n * stt.toDouble - st.toDouble * st.toDouble), 9)
    val icept = r((sy.toDouble - slope * st.toDouble) / n, 9)
    assert(row.getAs[Double]("slope") == r(slope, 6))
    assert(row.getAs[Double]("intercept") == r(icept, 2))
    val e = daily.map(x => BigDecimal(r(x._2.toDouble - icept - slope * x._1, 6)))
    val num = e.zip(e.tail).map { case (a, b) => (b - a) * (b - a) }.sum
    val den = e.map(x => x * x).sum
    val dw = r(num.toDouble / den.toDouble, 6)
    assert(row.getAs[Double]("dw") == dw)
    assert(dw >= 0 && dw <= 4, "DW range law")
    assert(row.getAs[Double]("rho_hat") == r(1.0 - dw / 2, 6))
  }
}
