package graft.ops

import graft.SparkTestBase

/** Wave q538–q540 semantics against literal driver-side replays on
  * sf0.001. */
class WaveLSpec extends SparkTestBase {

  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def toks(t: String): Seq[String] =
    "\\w+".r.findAllIn(t.toLowerCase(java.util.Locale.ROOT)).toSeq

  test("q538: adstock correlations equal the literal fold replay") {
    val daily = Tables(spark, sfDir).orders
      .selectExpr("CAST(CAST(o_orderdate AS DATE) AS STRING) AS day",
        "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).toSeq.map { case (d, rows) =>
        (d, rows.length.toLong,
          rows.map(x => math.floor(x._2 * 100 + 0.5).toLong).sum / 100000L)
      }.sortBy(_._1)
    val truth = Seq(0.25, 0.5, 0.75).map { theta =>
      var a = 0.0
      val ad = daily.map { case (_, x, _) =>
        a = x.toDouble + theta * a
        math.floor(a + 0.5).toLong
      }
      val ys = daily.map(_._3)
      val n = ad.length.toLong
      val sa = ad.sum; val sy = ys.sum
      val say = ad.zip(ys).map(p => p._1 * p._2).sum
      val saa = ad.map(v => v * v).sum
      val syy = ys.map(v => v * v).sum
      (theta, n, r9((n * say - sa * sy).toDouble /
        (math.sqrt((n * saa - sa * sa).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))))
    }.toSet
    val got = AdstockOps.q538AdstockFit.fn(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q539: bow-tie census equals a literal reachability replay") {
    val nk = Tables(spark, sfDir).supplier
      .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables(spark, sfDir).lineitem
      .selectExpr("l_partkey", "l_suppkey",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wmap = scala.collection.mutable.Map.empty[(Long, Long), Long]
    li.groupBy(_._1).values.foreach { rows =>
      val seq = rows.sortBy(r => (r._3, r._2))
      seq.zip(seq.tail).foreach { case ((_, s1, _), (_, s2, _)) =>
        if (s1 != s2 && nk(s1) != nk(s2))
          wmap((nk(s1), nk(s2))) = wmap.getOrElse((nk(s1), nk(s2)), 0L) + 1
      }
    }
    val dedges = wmap.toSeq.map { case ((u, v), w) => (u, v, w) }
    val e = dedges.size
    val tau = dedges.sortBy { case (u, v, w) => (w, u, v) }
      .apply(math.ceil(e * 0.75).toInt - 1)._3
    val edges = dedges.filter(_._3 >= tau).map(x => (x._1, x._2))
    val nodes = edges.flatMap(x => Seq(x._1, x._2)).distinct
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def reach(from: Long): Set[Long] = {
      var seen = Set.empty[Long]; var frontier = adj.getOrElse(from, Set())
      while ((frontier -- seen).nonEmpty) {
        seen ++= frontier
        frontier = frontier.flatMap(f => adj.getOrElse(f, Set.empty))
      }
      seen
    }
    val reachM = nodes.map(v => v -> reach(v)).toMap
    val sccId = nodes.map { v =>
      val mut = nodes.filter(u => reachM(v)(u) && reachM(u)(v))
      v -> (mut :+ v).filter(u => u == v ||
        (reachM(v)(u) && reachM(u)(v))).min
    }.toMap
    val byScc = nodes.groupBy(sccId)
    val coreId = byScc.toSeq.sortBy { case (id, ns) => (-ns.size, id) }.head._1
    val core = byScc(coreId).toSet
    val cls = nodes.map { v =>
      val comp =
        if (sccId(v) == coreId) "CORE"
        else if (reachM(v).exists(core)) "IN"
        else if (core.exists(c => reachM(c)(v))) "OUT"
        else "OTHER"
      (v, comp)
    }
    val sizes = cls.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val truth = cls.map { case (v, c) => (v, c, sizes(c)) }.toSet
    val got = BowtieOps.q539Bowtie.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q540: ERR equals the literal cascade walk") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
    val truth = Seq("scan", "join", "window", "stream").map { term =>
      val postings = docs.map { case (id, ts) =>
        (id, ts.count(_ == term).toLong) }.filter(_._2 > 0)
      val top = postings.sortBy { case (id, tf) => (-tf, id) }.take(10)
      var p = 1.0; var err = 0.0
      top.zipWithIndex.foreach { case ((_, tf), i) =>
        val g = if (tf >= 5) 3 else if (tf >= 3) 2 else 1
        val rr = (math.pow(2.0, g) - 1.0) / 16.0
        err = err + p * rr / (i + 1).toDouble
        p = p * (1.0 - rr)
      }
      (term, top.length.toLong, r9(err))
    }.toSet
    val got = ErrMetricOps.q540ErrMetric.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }
}
