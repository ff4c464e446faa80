package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** q495 semantics: the md5-coin relabeling is exactly reproducible, so
  * the permutation p-value is a deterministic function of the data —
  * replayed here coin by coin. */
class PermTestOpsSpec extends SparkTestBase {

  private def u(key: Long, r: Int): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"${key}_$r".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) + 1.0) / 1152921504606846976.0
  }

  test("q495: p-value == coin-by-coin replay of all 64 relabelings") {
    val base = Tables(spark, sfDir).orders
      .where("o_orderpriority IN ('1-URGENT','5-LOW')")
      .selectExpr("o_orderkey", "o_orderpriority = '1-URGENT' AS is_a",
        "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))

    val nA = base.count(_._2).toLong
    val n = base.length.toLong
    val obs = base.filter(_._2).map(_._3).sum.toDouble / nA -
      base.filterNot(_._2).map(_._3).sum.toDouble / (n - nA)
    val p = nA.toDouble / n
    val nExtreme = (0 until 64).count { r =>
      val (sa, ca, st) = base.foldLeft((0L, 0L, 0L)) {
        case ((sa, ca, st), (k, _, c)) =>
          if (u(k, r) < p) (sa + c, ca + 1, st + c) else (sa, ca, st + c)
      }
      val stat = sa.toDouble / ca - (st - sa).toDouble / (n - ca)
      math.abs(stat) >= math.abs(obs)
    }

    val row = PermTestOps.q495PermTest.fn(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_a") == nA && row.getAs[Long]("n_b") == n - nA)
    assert(row.getAs[Long]("n_extreme") == nExtreme, "extreme-count replay")
    assert(math.abs(row.getAs[Double]("obs_diff") - obs) < 1e-3)
    assert(math.abs(row.getAs[Double]("p_value") -
      (nExtreme + 1.0) / 65.0) < 1e-5)
  }
}
