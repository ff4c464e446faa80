package graft.ops

import graft.SparkTestBase

/** q494 semantics: every consecutive per-user trigram counted once, the
  * report is the true top-20 by occurrence, and lift is the count over
  * the order-free unigram baseline. */
class SeqPatOpsSpec extends SparkTestBase {

  test("q494: window trigrams == brute-force per-user replay; true top-20") {
    val ev = EventOps.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id",
        "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    val tris = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4)
      seq.sliding(3).filter(_.size == 3)
        .map(w => (rows.head._1, (w(0), w(1), w(2)))).toSeq
    }
    val occ = tris.groupBy(_._2).map { case (k, v) =>
      k -> (v.size.toLong, v.map(_._1).distinct.size.toLong)
    }
    val nTri = tris.size.toLong
    val uni = ev.groupBy(_._4).map { case (k, v) => k -> v.size.toLong }
    val nEv = ev.length.toLong

    val top20 = occ.toSeq
      .sortBy { case ((g0, g1, g2), (n, _)) => (-n, g0, g1, g2) }.take(20)
    val rows = SeqPatOps.q494SeqpatMining.fn(spark, sfDir).collect()
    assert(rows.length == math.min(20, occ.size))
    rows.zip(top20).foreach { case (r, ((g0, g1, g2), (n, u))) =>
      assert((r.getAs[String]("g0"), r.getAs[String]("g1"),
        r.getAs[String]("g2")) == ((g0, g1, g2)), "top-20 order")
      assert(r.getAs[Long]("n_occ") == n && r.getAs[Long]("n_users") == u)
      val lift = n.toDouble / (nTri.toDouble *
        (uni(g0).toDouble / nEv) * (uni(g1).toDouble / nEv) *
        (uni(g2).toDouble / nEv))
      assert(math.abs(r.getAs[Double]("lift") - lift) < 1e-3, "lift formula")
      assert(math.abs(r.getAs[Double]("support") - n.toDouble / nTri) < 1e-5)
    }
  }
}
