package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for wave q449–q451: an exact integer-state replay of
  * the Holt–Winters trajectory (the even-tenths LONG discipline makes
  * equality exact, not approximate), a Mood's-median cell/χ² replay
  * with the 2×k margin laws, and KPSS moment identities.
  */
class HoltWintersOpsSpec extends SparkTestBase {

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q449: exact integer-state trajectory replay") {
    val rows = HoltWintersOps.q449HoltWinters.fn(spark, sfDir).collect()
    val census = Tables(spark, sfDir).orders
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("m"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 10000)
        .cast("decimal(18,0)").cast("long").as("y")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val (lo, hi) = (census.keys.min, census.keys.max)
    val ys = (lo to hi).map(m => census.getOrElse(m, 0L)).toArray
    val t = ys.length
    assert(rows.length == t - 12)
    def upd(a: Long, b: Long): Long =
      math.round((4.0 * a + 6.0 * b) / 10.0)
    var l = math.floor(ys.take(12).sum / 12.0).toLong
    var b = math.floor((math.floor(ys.slice(12, 24).sum / 12.0).toLong - l)
      / 12.0).toLong
    val s = Array.tabulate(12)(i => ys(i) - l)
    var sumAbsErr = BigInt(0)
    rows.zipWithIndex.foreach { case (row, i) =>
      val k = i + 12
      val su = s(k % 12)
      val fc = l + b + su
      val lN = upd(ys(k) - su, l + b)
      val bN = upd(lN - l, b)
      val sN = upd(ys(k) - lN, su)
      assert(row.getAs[Long]("k") == k.toLong)
      assert(row.getAs[Double]("fc") == fc / 10000.0, s"fc at $k")
      assert(row.getAs[Double]("level") == lN / 10000.0, s"level at $k")
      assert(row.getAs[Double]("trend") == bN / 10000.0, s"trend at $k")
      assert(row.getAs[Double]("s_used") == su / 10000.0, s"s_used at $k")
      assert(row.getAs[Double]("err") == (ys(k) - fc) / 10000.0)
      sumAbsErr += BigInt(math.abs(ys(k) - fc))
      l = lN; b = bN; s(k % 12) = sN
    }
    assert(rows.head.getAs[Double]("fc_next") == (l + b + s(t % 12)) / 10000.0)
    val mae = r((BigDecimal(sumAbsErr) / rows.length / 10000).toDouble, 4)
    assert(math.abs(rows.head.getAs[Double]("mae") - mae) < 2e-4)
  }

  test("q450: cell replay and margin laws") {
    val rows = StationarityOps.q450MoodMedian.fn(spark, sfDir).collect()
    assert(rows.length == 5)
    val o = Tables(spark, sfDir).orders
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)"), col("o_orderkey"))
      .collect()
      .map(x => (x.getString(0), BigDecimal(x.getDecimal(1)), x.getLong(2)))
    val n = o.length
    val med = o.sortBy(x => (x._2, x._3)).apply((n + 1) / 2 - 1)._2
    val byG = o.filter(_._2 != med).groupBy(_._1)
    rows.foreach { row =>
      val g = row.getAs[String]("grp")
      assert(row.getAs[Long]("n_above") == byG(g).count(_._2 > med).toLong)
      assert(row.getAs[Long]("n_below") == byG(g).count(_._2 < med).toLong)
    }
    val ta = rows.map(_.getAs[Long]("n_above")).sum
    val tb = rows.map(_.getAs[Long]("n_below")).sum
    assert(math.abs(ta - tb) <= o.count(_._2 == med) + 1)
    val chi2 = rows.head.getAs[Double]("chi2")
    assert(chi2 >= 0)
    assert(rows.forall(_.getAs[Double]("chi2") == chi2))
    assert(rows.head.getAs[Double]("p_value") ==
      r(math.exp(-chi2 / 2) * (1 + chi2 / 2), 6))
  }

  test("q451: KPSS identities and bounds") {
    val row = StationarityOps.q451Kpss.fn(spark, sfDir).head()
    val eta = row.getAs[Double]("eta")
    val g0 = row.getAs[Double]("gamma0")
    val s2 = row.getAs[Double]("sigma2_lr")
    assert(eta > 0, "partial-sum mass positive")
    assert(g0 > 0, "variance positive")
    assert(s2 > 0, "long-run variance positive")
    assert(row.getAs[Long]("bartlett_l") == 7L)
    // γ₀ replay from the descaled integer series
    val ys = Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(floor((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(18,0)").cast("double") / 1000000.0)
        .cast("long").as("y"))
      .collect().map(_.getLong(1))
    val n = ys.length.toDouble
    val mu = ys.sum / n
    val g0r = r(ys.map(y => y.toDouble * y).sum / n - mu * mu, 4)
    assert(math.abs(g0 - g0r) <= 1e-4 + math.abs(g0r) * 1e-9, s"$g0 vs $g0r")
    assert(row.getAs[Long]("n_days") == ys.length.toLong)
  }
}
