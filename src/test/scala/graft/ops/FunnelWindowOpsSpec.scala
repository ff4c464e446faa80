package graft.ops

import graft.SparkTestBase

/** q504 semantics: the 1-hour windowed funnel replayed user by user —
  * earliest view anchors, first in-window click, first in-window
  * purchase after the click — and the depth histogram partitions all
  * users exactly once. */
class FunnelWindowOpsSpec extends SparkTestBase {

  test("q504: depth histogram == per-user anchored replay") {
    val T = 3600L * 1000000L
    val ev = EventOps.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS tus", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    val perUser = ev.groupBy(_._1).toSeq.map { case (_, rs) =>
      val view = rs.filter(_._3 == "view").map(_._2)
        .sorted.headOption
      val click = view.flatMap(tv => rs.filter(r =>
        r._3 == "click" && r._2 > tv && r._2 <= tv + T)
        .map(_._2).sorted.headOption)
      val purchase = (view, click) match {
        case (Some(tv), Some(tc)) => rs.filter(r =>
          r._3 == "purchase" && r._2 > tc && r._2 <= tv + T)
          .map(_._2).sorted.headOption
        case _ => None
      }
      val depth: Long =
        if (purchase.isDefined) 3L else if (click.isDefined) 2L
        else if (view.isDefined) 1L else 0L
      val lat = (purchase, view) match {
        case (Some(tp), Some(tv)) => tp - tv
        case _ => 0L
      }
      (depth, lat)
    }.toSeq

    val byDepth = perUser.groupBy(_._1)
    val rows = FunnelWindowOps.q504WindowFunnel.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_users")).sum == byDepth.values.map(_.size).sum,
      "every user lands in exactly one depth bucket")
    rows.foreach { r =>
      val d = r.getAs[Long]("depth")
      val es = byDepth(d)
      assert(r.getAs[Long]("n_users") == es.size.toLong, s"count @depth $d")
      val avg = es.map(_._2).sum.toDouble / (es.size * 1e6)
      assert(math.abs(r.getAs[Double]("avg_complete_sec") - avg) < 1e-3,
        s"latency @depth $d")
    }
  }
}
