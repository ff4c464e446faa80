package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** Wave q534–q537 semantics against literal driver-side replays on
  * sf0.001. */
class WaveKSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val daily: Seq[(String, Long)] =
    Tables(spark, sfDir).orders
      .selectExpr("CAST(CAST(o_orderdate AS DATE) AS STRING) AS day")
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)

  test("q534: Hampel flags equal the literal rolling median/MAD walk") {
    val xs = daily.map(_._2)
    val truth = (3 until daily.length - 3).flatMap { i =>
      val win = (i - 3 to i + 3).map(xs).sorted
      val med = win(3)
      val mad = win.map(v => math.abs(v - med)).sorted.apply(3)
      val dev = math.abs(xs(i) - med) * 10000
      if (dev > mad * 44478) Some((daily(i)._1, xs(i), med, mad, dev))
      else None
    }.toSet
    val got = SeriesCleanOps.q534HampelFilter.fn(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q537: WE rule flags equal the literal zone walk") {
    val xs = daily.map(_._2)
    val n = xs.length.toLong
    val sx = xs.sum; val sxx = xs.map(v => v * v).sum
    val mu = sx.toDouble / n
    val sigma = math.sqrt((n.toDouble * sxx - sx.toDouble * sx) /
      (n.toDouble * (n - 1)))
    def zone(x: Long, k: Int): Long =
      if (x > mu + k * sigma) 1L else if (x < mu - k * sigma) -1L else 0L
    val truth = daily.indices.flatMap { i =>
      val x = xs(i)
      val r1 = if (zone(x, 3) != 0) 1L else 0L
      def ruleWin(w: Int, k: Int, need: Int): Long =
        if (i + 1 < w) 0L
        else {
          val zs = (i - w + 1 to i).map(j => zone(xs(j), k))
          if (zs.count(_ == 1L) >= need || zs.count(_ == -1L) >= need) 1L
          else 0L
        }
      val r2 = ruleWin(3, 2, 2)
      val r3 = ruleWin(5, 1, 4)
      val r4 = if (i + 1 < 8) 0L
        else {
          val sides = (i - 7 to i).map(j => if (xs(j) > mu) 1L else -1L)
          if (math.abs(sides.sum) == 8) 1L else 0L
        }
      if (r1 + r2 + r3 + r4 > 0) Some((daily(i)._1, x, r1, r2, r3, r4))
      else None
    }.toSet
    val got = SeriesCleanOps.q537WesternElectric.fn(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q535: Qini deciles equal the literal arm census") {
    val conv = Tables(spark, sfDir).orders
      .select("o_custkey", "o_orderpriority").collect()
      .filter(r => Set("1-URGENT", "2-HIGH")(r.getString(1)))
      .map(_.getLong(0)).toSet
    val custs = Tables(spark, sfDir).customer
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val ranked = custs.sortBy { case (ck, bal) => (-bal, ck) }
    val nC = ranked.length
    // ntile(10) semantics: first (n % 10) tiles get ceil(n/10) rows
    val base = nC / 10; val extra = nC % 10
    val truth = ranked.zipWithIndex.map { case ((ck, _), i) =>
      val dec =
        if (i < (base + 1) * extra) i / (base + 1) + 1
        else (i - (base + 1) * extra) / base + extra + 1
      val treated =
        (BigInt(md5hex(s"arm|$ck").substring(0, 15), 16) % 2).toLong
      (dec.toLong, treated, if (conv(ck)) 1L else 0L)
    }.groupBy(_._1).map { case (d, rows) =>
      val nT = rows.count(_._2 == 1L).toLong
      val nCc = rows.count(_._2 == 0L).toLong
      val pT = rows.filter(_._2 == 1L).map(_._3).sum
      val pC = rows.filter(_._2 == 0L).map(_._3).sum
      (d, nT, nCc, pT, pC,
        BigDecimal(1e6 * (pT.toDouble - pC.toDouble * nT / nCc))
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = UpliftOps.q535QiniDeciles.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q536: RR estimator equals the literal coin walk") {
    val sens = Tables(spark, sfDir).orders
      .select("o_custkey", "o_orderpriority").collect()
      .filter(r => Set("1-URGENT", "2-HIGH")(r.getString(1)))
      .map(_.getLong(0)).toSet
    val custs = Tables(spark, sfDir).customer
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val truth = custs.groupBy(_._2).map { case (nation, cs) =>
      val n = cs.length.toLong
      val truePos = cs.count(c => sens(c._1)).toLong
      val obs = cs.map { case (ck, _) =>
        val honest = BigInt(md5hex(s"rr|$ck").substring(0, 15), 16) % 4 < 3
        val t = if (sens(ck)) 1L else 0L
        if (honest) t else 1L - t
      }.sum
      val piHat = 2.0 * obs / n - 0.5
      (nation, n, truePos, obs, r9(piHat), r9(piHat - truePos.toDouble / n))
    }.toSet
    val got = RandResponseOps.q536RandomizedResponse.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }
}
