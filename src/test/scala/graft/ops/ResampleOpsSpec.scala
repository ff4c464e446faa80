package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** q506 semantics: per-bin rejection with the c/n_b rule replayed coin
  * by coin; the rarest bin keeps everything (accept_p = 1), and
  * achieved shares sum to 1. */
class ResampleOpsSpec extends SparkTestBase {

  private def u(docId: Long): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"rr|$docId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) + 1.0) / 1152921504606846976.0
  }

  test("q506: resample == coin-by-coin replay; rarest bin kept whole") {
    val docs = Tables(spark, sfDir).documents
      .selectExpr("doc_id", "n_chars / 100 AS bin")
      .collect().map(r => (r.getLong(0), r.getDouble(1).toLong))
    val byBin = docs.groupBy(_._2)
    val c = byBin.values.map(_.length).min.toLong

    val rows = ResampleOps.q506RejectionResample.fn(spark, sfDir).collect()
    assert(rows.length == byBin.size)
    val accTotal = byBin.toSeq.map { case (b, ds) =>
      ds.count(d => u(d._1) < c.toDouble / ds.length)
    }.sum
    rows.foreach { r =>
      val b = r.getAs[Long]("bin")
      val ds = byBin(b)
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      val kept = ds.count(d => u(d._1) < c.toDouble / ds.length)
      assert(r.getAs[Long]("n_accepted") == kept.toLong, s"kept @bin $b")
      assert(math.abs(r.getAs[Double]("accept_p") -
        c.toDouble / ds.length) < 1e-5)
      assert(math.abs(r.getAs[Double]("achieved_share") -
        kept.toDouble / accTotal) < 1e-5)
      if (ds.length.toLong == c)
        assert(r.getAs[Long]("n_accepted") == c, "rarest bin kept whole")
    }
    assert(math.abs(rows.map(_.getAs[Double]("achieved_share")).sum - 1.0)
      < 1e-4, "achieved shares sum to 1")
  }
}
