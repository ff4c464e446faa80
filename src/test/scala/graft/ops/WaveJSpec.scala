package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** Wave q529–q533 semantics against literal driver-side replays on
  * sf0.001. */
class WaveJSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val orders: Array[(Long, String, Double)] =
    Tables(spark, sfDir).orders
      .select("o_custkey", "o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

  private def urgent(p: String) = p == "1-URGENT" || p == "2-HIGH"

  test("q529: LOO encoding equals the closed-form leak audit") {
    val seg = Tables(spark, sfDir).customer
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = orders.groupBy(o => seg(o._1)).map { case (sg, os) =>
      val n = os.length.toLong
      val pos = os.count(o => urgent(o._2)).toLong
      (sg, n, pos, 1000000L * pos / n,
        1000000L * (pos - 1) / (n - 1), 1000000L * pos / (n - 1),
        1000000L * pos / (n - 1) - 1000000L * (pos - 1) / (n - 1))
    }.toSet
    val got = FeatureEngOps.q529LooTargetEncoding.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q530: hashing collision audit equals the literal census") {
    val mass = Tables(spark, sfDir).documents.select("text").collect()
      .flatMap(r => "\\w+".r.findAllIn(
        r.getString(0).toLowerCase(java.util.Locale.ROOT)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val truth = Seq(8, 12, 16).map { k =>
      val mod = 1L << k
      val byBucket = mass.toSeq.groupBy { case (tok, _) =>
        (BigInt(md5hex(s"fh|$tok").substring(0, 15), 16) % mod).toLong }
      val nFeat = mass.size.toLong
      val used = byBucket.size.toLong
      val collidedF = byBucket.values.filter(_.size > 1).map(_.size.toLong).sum
      val total = mass.values.sum
      val collM = byBucket.values.filter(_.size > 1)
        .map(_.map(_._2).sum).sum
      (k.toLong, nFeat, used, collidedF, 1000000L * collM / total)
    }.toSet
    val got = FeatureEngOps.q530FeatureHashing.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q531: WOE/IV equals the literal binned replay") {
    val cents = orders.map(o =>
      (math.floor(o._3 * 100 + 0.5).toLong, if (urgent(o._2)) 1L else 0L))
    val mn = cents.map(_._1).min; val mx = cents.map(_._1).max
    val width = (mx - mn) / 8 + 1
    val bins = cents.groupBy(c => (c._1 - mn) / width).map { case (b, cs) =>
      (b, cs.length.toLong, cs.map(_._2).sum)
    }
    val tp = bins.map(_._3).sum; val tn = bins.map(x => x._2 - x._3).sum
    val truth = bins.map { case (b, n, pos) =>
      val neg = n - pos
      val woe = math.floor(math.log(
        ((pos + 1) * (tn + 8)).toDouble / ((neg + 1) * (tp + 8))) * 1e6).toLong
      val iv = math.floor(
        (((pos + 1) * (tn + 8) - (neg + 1) * (tp + 8)).toDouble /
          ((tp + 8).toDouble * (tn + 8))) * (woe / 1e6) * 1e6).toLong
      (b, n, pos, neg, woe, iv)
    }.toSet
    val got = FeatureEngOps.q531WoeIv.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q532: ZIP moments equal the literal replay") {
    val nat = Tables(spark, sfDir).customer
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perCust = nat.toSeq.map { case (ck, nation) =>
      (nation, orders.count(_._1 == ck).toLong) }
    val truth = perCust.groupBy(_._1).map { case (nation, ks) =>
      val n = ks.length.toLong
      val zeros = ks.count(_._2 == 0).toLong
      val sk = ks.map(_._2).sum; val skk = ks.map(k => k._2 * k._2).sum
      val mean = sk.toDouble / n
      val vr = (n.toDouble * skk - sk.toDouble * sk) / (n.toDouble * (n - 1))
      val lam = (vr + mean * mean - mean) / mean
      (nation, n, zeros, r9(mean), r9(vr), r9(lam), r9(1.0 - mean / lam))
    }.toSet
    val got = CountModelOps.q532ZipFit.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q533: AUC equals the literal midrank replay") {
    val scored = orders.map(o =>
      (math.floor(o._3 * 100 + 0.5).toLong, if (urgent(o._2)) 1L else 0L))
    val census = scored.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (c, g) => (c, g.length.toLong, g.map(_._2).sum) }
    var cum = 0L; var s2 = 0L
    census.foreach { case (_, cnt, pos) =>
      val mr2 = 2 * cum + cnt + 1
      s2 += pos * mr2
      cum += cnt
    }
    val n1 = scored.map(_._2).sum
    val n0 = scored.length - n1
    val auc = (s2 - n1 * (n1 + 1)).toDouble / (2.0 * n1 * n0)
    val row = AucOps.q533AucMannWhitney.fn(spark, sfDir).collect().head
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("n0") == n0)
    assert(row.getAs[Long]("s2") == s2)
    assert(row.getAs[Double]("auc") == r9(auc))
  }
}
