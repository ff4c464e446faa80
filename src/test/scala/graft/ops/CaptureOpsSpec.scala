package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the capture-recapture wave (q416): the md5 gates
  * are replayed in Scala, overlap laws hold, and the Chapman estimator
  * follows its closed form exactly.
  */
class CaptureOpsSpec extends SparkTestBase {

  private def gate(salt: String, id: Long): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt$id".getBytes("UTF-8"))
    val hex = d.take(2).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % 100 < (if (salt == "crawlA|") 30 else 40)
  }

  test("q416: md5 capture replay and Chapman closed form") {
    val r = CaptureOps.q416CaptureRecapture.fn(spark, sfDir).head()
    val ids = Tables(spark, sfDir).documents
      .select(col("doc_id")).collect().map(_.getLong(0))
    val a = ids.count(gate("crawlA|", _)).toLong
    val b = ids.count(gate("crawlB|", _)).toLong
    val m = ids.count(id => gate("crawlA|", id) && gate("crawlB|", id)).toLong
    assert(r.getAs[Long]("n1") == a && r.getAs[Long]("n2") == b &&
      r.getAs[Long]("m") == m)
    assert(m <= math.min(a, b) && m > 0)
    assert(r.getAs[Long]("true_n") == ids.length.toLong)
    def r2(x: Double) = BigDecimal(x).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val chapman = r2((a + 1).toDouble * (b + 1) / (m + 1) - 1)
    assert(r.getAs[Double]("chapman_est") == chapman)
    val se = r2(math.sqrt((a + 1).toDouble * (b + 1) * (a - m) * (b - m) /
      ((m + 1).toDouble * (m + 1) * (m + 2))))
    assert(r.getAs[Double]("se") == se)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("ci_hi"))
    // Chapman is the bias-corrected LP: always <= LP on the same counts
    assert(r.getAs[Double]("chapman_est") <= r.getAs[Double]("lp_est") + 1e-9)
  }
}
