package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** q487 semantics: the grid-bucketed equi-join finds EXACTLY the pairs a
  * brute-force all-pairs radius scan finds — the grid must never drop a
  * boundary pair (cell edge = radius makes 3×3 sufficient) nor
  * double-count one (each point lives in one cell). */
class SpatialOpsSpec extends SparkTestBase {

  private def coord(salt: String, key: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$salt$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 10000L
  }

  test("q487: grid join == brute-force radius scan on every supplier") {
    val t = Tables(spark, sfDir)
    val custs = t.customer.select("c_custkey").collect().map(_.getLong(0))
      .map(k => (coord("cx|", k), coord("cy|", k)))
    val supps = t.supplier.select("s_suppkey").collect().map(_.getLong(0))
      .map(k => k -> (coord("sx|", k), coord("sy|", k))).toMap
    val r2 = 500L * 500L

    val rows = SpatialOps.q487GridSpatialJoin.fn(spark, sfDir).collect()
    assert(rows.length == supps.size, "one row per supplier")
    rows.foreach { r =>
      val (sx, sy) = supps(r.getAs[Long]("s_suppkey"))
      val d2s = custs.map { case (x, y) =>
        (sx - x) * (sx - x) + (sy - y) * (sy - y)
      }.filter(_ <= r2)
      assert(r.getAs[Long]("n_within") == d2s.length,
        s"supplier ${r.getAs[Long]("s_suppkey")}: count mismatch")
      val nearest = if (d2s.isEmpty) -1L else d2s.min
      assert(r.getAs[Long]("nearest_d2") == nearest,
        s"supplier ${r.getAs[Long]("s_suppkey")}: nearest mismatch")
    }
    // the fixture exercises both the dense and the empty-neighborhood path
    assert(rows.exists(_.getAs[Long]("n_within") > 0), "no pair in radius")
  }
}
