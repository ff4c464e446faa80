package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q474 semantics: a driver-side KMV replay (same md5-derived 60-bit
  * hashes) must reproduce every estimate exactly, and the estimates must
  * sit within the sketch's statistical error of the exact truths on the
  * fixture (k=32 → rsd ≈ 18%; we allow 4σ). */
class KmvSetOpsSpec extends SparkTestBase {

  test("q474: driver KMV replay is exact; estimates within 4 sigma of truth") {
    val K = 32
    val rows = KmvSetOps.q474KmvSetops.fn(spark, sfDir).collect()
    assert(rows.length == 10, "5 event types -> 10 unordered pairs")

    val ut = EventOps.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def h(u: Long): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(u.toString).take(15), 16)
    val sets = ut.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val sketches = sets.map { case (t, us) => t -> us.map(h).toSeq.sorted.take(K) }

    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val merged = (sketches(a) ++ sketches(b)).distinct.sorted.take(K)
      val common = merged.count(x => sketches(a).contains(x) && sketches(b).contains(x))
      def r4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      // mirror the operator's two branches: below capacity the sketch IS
      // the set; at capacity the theta estimator applies
      val (estU, estI) =
        if (merged.size < K) (r4(merged.size.toDouble), r4(common.toDouble))
        else {
          val theta = merged.last
          val eu = (K - 1).toDouble * 1152921504606846976.0 / theta.toDouble
          (r4(eu), r4(common.toDouble / K * eu))
        }
      assert(r.getAs[Double]("est_union") == estU, s"est_union of ($a,$b)")
      assert(r.getAs[Double]("est_inter") == estI, s"est_inter of ($a,$b)")
      assert(r.getAs[Long]("sketch_overlap") == common.toLong)

      val trueU = (sets(a) ++ sets(b)).size.toLong
      val trueI = (sets(a) intersect sets(b)).size.toLong
      assert(r.getAs[Long]("n_union") == trueU)
      assert(r.getAs[Long]("n_inter") == trueI)
      // 4σ for the union estimator (rsd ~ 1/sqrt(k-2))
      val sigma = trueU / math.sqrt((K - 2).toDouble)
      assert(math.abs(estU - trueU) <= 4 * sigma,
        s"($a,$b): est_union $estU vs $trueU exceeds 4 sigma")
    }
    // the fixture's audiences genuinely overlap — the intersection
    // estimator is exercised, not vacuously zero
    assert(rows.map(_.getAs[Long]("sketch_overlap")).sum > 0,
      "no sketch overlap anywhere — intersection path untested")
  }
}
