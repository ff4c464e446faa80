package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q491 semantics: the audit's per-source sampled counts must equal a
  * from-scratch JVM recompute of the q112 reservoir (MessageDigest md5,
  * same 60-bit uniform), and the report's algebra must be internally
  * consistent (counts sum to K, shares to 1, rep_ratio = n/expected). */
class ReservoirAuditOpsSpec extends SparkTestBase {

  private val K = 50

  private def esKey(docId: Long, nChars: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) /
      1152921504606846976.0
    math.log(u) / nChars
  }

  test("q491: sampled counts == JVM-recomputed reservoir; algebra consistent") {
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val kept = docs.map { case (id, src, nc) => (esKey(id, nc), id, src) }
      .sortBy { case (k, id, _) => (-k, id) }.take(K)
    val truthCounts = kept.groupBy(_._3).view.mapValues(_.length.toLong).toMap

    val rows = ReservoirAuditOps.q491ReservoirCoverage.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_sampled")).sum == K.toLong)
    assert(math.abs(rows.map(_.getAs[Double]("weight_share")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("expected_sampled")).sum - K) < 1e-2)
    for (r <- rows) {
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_sampled") == truthCounts.getOrElse(src, 0L),
        s"source $src: sampled ${r.getAs[Long]("n_sampled")} != truth")
      val expected = r.getAs[Double]("expected_sampled")
      val ratio = r.getAs[Double]("rep_ratio")
      assert(math.abs(ratio - r.getAs[Long]("n_sampled") / expected) < 1e-2,
        s"source $src: rep_ratio $ratio inconsistent")
    }
  }
}
