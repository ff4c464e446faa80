package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the ANOVA wave (q429): exact sum-of-squares
  * replay of F/η²/ω² and the Brown–Forsythe companion, plus the
  * SSB + SSW = SST decomposition law.
  */
class AnovaOpsSpec extends SparkTestBase {

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q429: exact SS replay, decomposition law, BF spread replay") {
    val rows = AnovaOps.q429OneWayAnova.fn(spark, sfDir).collect()
    assert(rows.length == 5, "five order priorities")
    assert(rows.map(_.getAs[Double]("f")).distinct.length == 1)

    val vals = Tables(spark, sfDir).orders
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)"))
      .collect().map(r => (r.getString(0), r.getDecimal(1)))
      .map { case (g, v) => (g, BigDecimal(v)) }
    val byG = vals.groupBy(_._1)
    val k = byG.size
    val n = vals.length.toLong

    // per-group exact DECIMAL moments → the same 6-dp rounded terms
    val sv = byG.map { case (g, xs) => g -> xs.map(_._2).sum }
    val svv = byG.map { case (g, xs) => g -> xs.map(x => x._2 * x._2).sum }
    def terms(s: Map[String, BigDecimal], ss: Map[String, BigDecimal]) = {
      val b = byG.keys.map { g =>
        g -> r(s(g).toDouble * s(g).toDouble / byG(g).length, 6) }.toMap
      val w = byG.keys.map { g =>
        g -> r(ss(g).toDouble - s(g).toDouble * s(g).toDouble / byG(g).length, 6) }.toMap
      (b, w)
    }
    val (bt, wt) = terms(sv, svv)
    val sAll = sv.values.sum.toDouble
    val ssb = bt.values.map(BigDecimal(_)).sum.toDouble - sAll * sAll / n
    val ssw = wt.values.map(BigDecimal(_)).sum.toDouble
    val msw = ssw / (n - k)
    assert(rows.head.getAs[Double]("f") == r(ssb / (k - 1) / msw, 6))
    assert(rows.head.getAs[Double]("eta2") == r(ssb / (ssb + ssw), 6))
    assert(rows.head.getAs[Double]("omega2") ==
      r((ssb - (k - 1) * msw) / (ssb + ssw + msw), 6))

    // Brown–Forsythe replay on z2 = |2v − (a+b)| around exact medians
    val med2 = byG.map { case (g, xs) =>
      val s = xs.map(_._2).sorted
      val lo = (s.length + 1) / 2 - 1; val hi = (s.length + 2) / 2 - 1
      g -> (s(lo) + s(hi))
    }
    val z = vals.map { case (g, v) => (g, (v * 2 - med2(g)).abs) }
    val zByG = z.groupBy(_._1)
    val szg = zByG.map { case (g, xs) => g -> xs.map(_._2).sum }
    val szzg = zByG.map { case (g, xs) => g -> xs.map(x => x._2 * x._2).sum }
    val (btz, wtz) = terms(szg, szzg)
    val szAll = szg.values.sum.toDouble
    val ssbZ = btz.values.map(BigDecimal(_)).sum.toDouble - szAll * szAll / n
    val sswZ = wtz.values.map(BigDecimal(_)).sum.toDouble
    assert(rows.head.getAs[Double]("bf_f") ==
      r(ssbZ / (k - 1) / (sswZ / (n - k)), 6))

    // decomposition law: SSB + SSW = SST (up to the 6-dp term rounding)
    val sst = svv.values.sum.toDouble - sAll * sAll / n
    assert(math.abs(ssb + ssw - sst) < 1e-3 * math.abs(sst) + 1.0)
    val eta2 = rows.head.getAs[Double]("eta2")
    assert(eta2 >= 0 && eta2 <= 1)
    rows.foreach { row =>
      val g = row.getAs[String]("grp")
      assert(row.getAs[Long]("n_g") == byG(g).length.toLong)
      assert(row.getAs[Double]("median_v") == med2(g).toDouble / 2)
    }
  }
}
