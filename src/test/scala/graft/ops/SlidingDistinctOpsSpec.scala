package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** q499 semantics: merging seven daily K-minimum-values sketches
  * answers each 7-day window — replayed sketch by sketch — and below
  * capacity the merged sketch IS the exact distinct set (law). */
class SlidingDistinctOpsSpec extends SparkTestBase {

  private val K = 64
  private def h(u: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q499: window estimates == daily-sketch merge replay") {
    val pairs = EventOps.events(spark, sfDir)
      .selectExpr("CAST(ts AS DATE) AS day", "user_id").distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))

    val d0 = pairs.map(_._1).min
    val daily = pairs.groupBy(_._1).map { case (d, rs) =>
      d -> rs.toSeq.map(r => h(r._2)).distinct.sorted.take(K)
    }
    val rows = SlidingDistinctOps.q499SlidingDistinct.fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wday = r.getDate(0).toLocalDate
      assert(!wday.isBefore(d0.plusDays(6)), "only full windows")
      val windowDays = (0 to 6).map(wday.minusDays(_))
      val exact = pairs.filter(p => windowDays.contains(p._1))
        .map(_._2).distinct.size.toLong
      assert(r.getAs[Long]("exact_users") == exact, s"exact @$wday")
      val merged = windowDays.flatMap(d => daily.getOrElse(d, Seq.empty[Long]))
        .distinct.sorted.take(K)
      val est =
        if (merged.size < K) merged.size.toDouble
        else (K - 1).toDouble * 1152921504606846976.0 / merged.last.toDouble
      assert(math.abs(r.getAs[Double]("kmv_est") - est) < 1e-3,
        s"KMV estimate @$wday")
      if (merged.size < K)
        assert(r.getAs[Double]("kmv_est") ==
          windowDays.flatMap(d => daily.getOrElse(d, Seq.empty[Long]))
            .distinct.size
            .toDouble, "below capacity the sketch is exact")
    }
  }
}
