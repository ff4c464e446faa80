package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** q498 semantics: universe sampling keeps whole keys, so every
  * estimate is inv·Σ_{h(k)<2⁶⁰/inv} deg(k)² EXACTLY — replayed here —
  * and at inv=1 the estimator degenerates to the truth (law). */
class UniverseSampleOpsSpec extends SparkTestBase {

  private def h(key: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q498: estimates == exact replay; inv=1 law recovers the truth") {
    val deg = Tables(spark, sfDir).lineitem
      .groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = deg.values.map(d => d * d).sum

    val rows = UniverseSampleOps.q498UniverseSample.fn(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("inv_rate"))
    assert(rows.map(_.getAs[Long]("inv_rate")).toSeq == Seq(4L, 16L, 64L))
    rows.foreach { r =>
      val inv = r.getAs[Long]("inv_rate")
      val th = 1152921504606846976L / inv
      val sampled = deg.filter { case (k, _) => h(k) < th }
      assert(r.getAs[Long]("exact_j") == exact)
      assert(r.getAs[Long]("n_keys") == deg.size.toLong)
      assert(r.getAs[Long]("n_keys_sampled") == sampled.size.toLong)
      val est = sampled.values.map(d => d * d).sum * inv
      assert(r.getAs[Long]("est_j") == est, s"estimate at 1/$inv")
      assert(math.abs(r.getAs[Double]("rel_err") -
        math.abs(est - exact).toDouble / exact) < 1e-5)
    }
    // inv=1 law: the "sample" is the whole universe
    val degAll = deg.filter { case (k, _) => h(k) < 1152921504606846976L }
    assert(degAll.values.map(d => d * d).sum * 1L == exact)
  }
}
