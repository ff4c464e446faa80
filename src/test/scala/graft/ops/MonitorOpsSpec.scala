package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the sequential-monitoring wave (q388): boundary
  * shape, cumulative-information laws, and a full brute force of the
  * looks table.
  */
class MonitorOpsSpec extends SparkTestBase {

  test("q388: looks accumulate, boundaries decay to nominal, table brute-forces") {
    val rows = MonitorOps.q388SequentialLooks.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("look"))
    assert(rows.length == 5)
    // information accumulates
    val n1s = rows.map(_.getAs[Long]("n1"))
    assert(n1s.sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
    // OBF boundary is strict early and exactly nominal at the last look
    val bs = rows.map(_.getAs[Double]("obf_boundary"))
    assert(bs.sliding(2).forall(p => p.length < 2 || p(0) > p(1)))
    assert(math.abs(bs.last - 1.959964) < 1e-6)
    // brute force from the raw event log
    val evs = EventOps.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._3, t._1))
    val n = evs.length
    val looks = evs.zipWithIndex.map { case ((_, uid, _, tpe), i) =>
      (math.min(5, i.toLong * 5 / n + 1), (uid % 2).toInt, tpe == "purchase")
    }
    var (n1, n2, c1, c2) = (0L, 0L, 0L, 0L)
    (1 to 5).foreach { k =>
      val slice = looks.filter(_._1 == k)
      n1 += slice.count(_._2 == 0); n2 += slice.count(_._2 == 1)
      c1 += slice.count(t => t._2 == 0 && t._3)
      c2 += slice.count(t => t._2 == 1 && t._3)
      val r = rows(k - 1)
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2,
        s"look $k: cumulative sizes diverge")
      val (p1, p2) = (c1.toDouble / n1, c2.toDouble / n2)
      val pp = (c1 + c2).toDouble / (n1 + n2)
      val z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
      assert(math.abs(r.getAs[Double]("z") - math.rint(z * 1e6) / 1e6) < 2e-6,
        s"look $k: z ${r.getAs[Double]("z")} != brute-forced $z")
      assert(r.getAs[Boolean]("crossed") ==
        (math.abs(z) > 1.959964 * math.sqrt(5.0 / k)))
    }
  }
}
