package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for wave q455–q457: RANSAC consensus optimality (no
  * other candidate has more inliers) + robustness law (RANSAC inlier
  * share high), the Bayesian A/B complement law P(B>A) + P(A>B) = 1
  * via an independent swapped replay, and a Page–Hinkley walk replay.
  */
class RansacOpsSpec extends SparkTestBase {

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def dailyRev(): Array[(Long, BigDecimal)] =
    Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("v")).collect()
      .map(x => (x.getLong(0), BigDecimal(x.getDecimal(1)))).sortBy(_._1)

  test("q455: consensus optimality over all 32 candidates; share sane") {
    val row = RansacOps.q455Ransac.fn(spark, sfDir).head()
    val pts = dailyRev()
    val n = pts.length
    assert(row.getAs[Long]("n_points") == n.toLong)
    // tau replay: 3 * MAD (lower medians)
    val med = pts.map(_._2).zip(pts.map(_._1)).sortBy(identity)
      .apply((n + 1) / 2 - 1)._1
    val tau = pts.map(x => ((x._2 - med).abs, x._1)).sortBy(identity)
      .apply((n + 1) / 2 - 1)._1 * 3
    assert(row.getAs[Double]("tau") == r(tau.toDouble, 2))
    // candidate replay via the engine's own md5 derivation
    import graft.functions.VectorFunctions.md5LongLocal
    def pm(h: Long, m: Long): Long = { val x = h % m; if (x < 0) x + m else x }
    val inliers = (0L until 32L).map { c =>
      val i1 = pm(md5LongLocal(s"ransac-$c-a"), n)
      val i2r = pm(md5LongLocal(s"ransac-$c-b"), n - 1)
      val i2 = if (i2r >= i1) i2r + 1 else i2r
      val (t1, v1) = pts(i1.toInt); val (t2, v2) = pts(i2.toInt)
      val slope = r((v2 - v1).toDouble / (t2 - t1), 9)
      val icept = r(v1.toDouble - slope * t1, 9)
      c -> pts.count { case (t, v) =>
        math.abs(v.toDouble - (icept + slope * t)) <= tau.toDouble }
    }
    val best = inliers.maxBy(x => (x._2, -x._1))
    assert(row.getAs[Long]("best_cand") == best._1)
    assert(row.getAs[Long]("n_inliers") == best._2.toLong)
    assert(inliers.forall(_._2 <= best._2), "consensus optimality")
    val share = row.getAs[Double]("inlier_share")
    assert(share > 0.2 && share <= 1.0)
  }

  test("q456: complement law P(B>A) + P(A>B) = 1 via swapped replay") {
    val rows = BayesAbOps.q456BayesianAb.fn(spark, sfDir).collect()
    assert(rows.length == 2)
    val byArm = rows.map(x => x.getAs[String]("arm") -> x).toMap
    val (na, ra) = (byArm("non_urgent").getAs[Long]("n"),
      byArm("non_urgent").getAs[Long]("successes"))
    val (nb, rb) = (byArm("urgent").getAs[Long]("n"),
      byArm("urgent").getAs[Long]("successes"))
    // independent replay with plain lgamma (not the engine's spine)
    def lnB(x: Long, y: Long): Double =
      lgammaL(x) + lgammaL(y) - lgammaL(x + y)
    def lgammaL(k: Long): Double =
      (1L until k).map(j => math.log(j.toDouble)).sum // ln((k-1)!)
    def pGt(a1: Long, b1: Long, a2: Long, b2: Long): Double =
      (0L until a2).map { i =>
        math.exp(lnB(a1 + i, b1 + b2) - math.log((b2 + i).toDouble)
          - lnB(1 + i, b2) - lnB(a1, b1))
      }.sum
    val (aa, ba, ab, bb) = (ra + 1, na - ra + 1, rb + 1, nb - rb + 1)
    val pBA = pGt(aa, ba, ab, bb)
    val pAB = pGt(ab, bb, aa, ba)
    assert(math.abs(pBA + pAB - 1.0) < 1e-6, "complement law")
    assert(math.abs(rows.head.getAs[Double]("p_b_beats_a") - pBA) < 1e-4,
      s"engine ${rows.head.getAs[Double]("p_b_beats_a")} vs replay $pBA")
    rows.foreach { x =>
      assert(x.getAs[Double]("post_mean") ==
        r((x.getAs[Long]("successes") + 1.0) / (x.getAs[Long]("n") + 2.0), 6))
    }
  }

  test("q457: Page-Hinkley walk replay") {
    val row = BayesAbOps.q457PageHinkley.fn(spark, sfDir).head()
    val counts = Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(count(lit(1)).as("c")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val (lo, hi) = (counts.keys.min, counts.keys.max)
    val xs = (lo to hi).map(t => counts.getOrElse(t, 0L)).toArray
    val n = xs.length
    assert(row.getAs[Long]("n_days") == n.toLong)
    val mu = xs.sum.toDouble / n
    val sd = math.sqrt(xs.map(x => x.toDouble * x).sum / n - mu * mu)
    assert(row.getAs[Double]("threshold") == r(5 * sd, 4))
    var pre = 0.0; var minm = Double.MaxValue; var maxPh = 0.0
    var argmax = -1L; var alarm = Option.empty[Long]
    var prefix = 0L
    xs.zipWithIndex.foreach { case (x, i) =>
      prefix += x
      val m = prefix - (i + 1) * (mu + 0.5)
      minm = math.min(minm, m)
      val ph = r(m - minm, 6)
      if (ph > maxPh) { maxPh = ph; argmax = lo + i }
      if (alarm.isEmpty && ph > r(5 * sd, 4)) alarm = Some(lo + i)
    }
    assert(row.getAs[Double]("max_ph") == r(maxPh, 4))
    assert(row.getAs[Long]("argmax_day") == argmax)
    assert(row.getAs[Boolean]("alarmed") == alarm.isDefined)
  }
}
