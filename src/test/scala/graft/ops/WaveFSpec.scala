package graft.ops

import graft.SparkTestBase

/** Wave q512–q516 semantics, each against a literal driver-side replay
  * on sf0.001. */
class WaveFSpec extends SparkTestBase {

  /** Undirected nation trade edges recomputed literally (per-part
    * shipdate-ordered supplier handoffs, cross-nation only). */
  private lazy val tradeUndirected: Map[(Long, Long), Long] = {
    val nk = Tables(spark, sfDir).supplier
      .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables(spark, sfDir).lineitem
      .selectExpr("l_partkey", "l_suppkey",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dir = scala.collection.mutable.Map.empty[(Long, Long), Long]
    li.groupBy(_._1).values.foreach { rows =>
      val seq = rows.sortBy(r => (r._3, r._2))
      seq.zip(seq.tail).foreach { case ((_, s1, _), (_, s2, _)) =>
        if (s1 != s2 && nk(s1) != nk(s2)) {
          val k = (math.min(nk(s1), nk(s2)), math.max(nk(s1), nk(s2)))
          dir(k) = dir.getOrElse(k, 0L) + 1
        }
      }
    }
    dir.toMap
  }

  test("q512: threshold-cut clusters equal a literal union-find replay") {
    val edges = tradeUndirected.toSeq.map { case ((a, b), w) => (a, b, w) }
    val e = edges.size
    val tau = edges.sortBy { case (a, b, w) => (w, a, b) }
      .apply(math.ceil(e * 0.75).toInt - 1)._3
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val nodes = edges.flatMap(x => Seq(x._1, x._2)).distinct
    edges.filter(_._3 >= tau).foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val member = nodes.map(n => n -> find(n)).toMap
    val sizes = member.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = member.map { case (n, c) => (n, c, sizes(c)) }.toSet
    val got = LinkageOps.q512SingleLinkage.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue)).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q513: PPR equals a literal integer-lattice replay") {
    val nk = Tables(spark, sfDir).supplier
      .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables(spark, sfDir).lineitem
      .selectExpr("l_partkey", "l_suppkey",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = scala.collection.mutable.Map.empty[(Long, Long), Long]
    li.groupBy(_._1).values.foreach { rows =>
      val seq = rows.sortBy(r => (r._3, r._2))
      seq.zip(seq.tail).foreach { case ((_, s1, _), (_, s2, _)) =>
        if (s1 != s2 && nk(s1) != nk(s2))
          edges((nk(s1), nk(s2))) = edges.getOrElse((nk(s1), nk(s2)), 0L) + 1
      }
    }
    val outw = edges.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val t = Tables(spark, sfDir)
    val america = t.region.where(org.apache.spark.sql.functions
      .col("r_name") === "AMERICA")
      .selectExpr("CAST(r_regionkey AS BIGINT)").collect().head.getLong(0)
    val seeds = t.nation
      .selectExpr("CAST(n_nationkey AS BIGINT)", "CAST(n_regionkey AS BIGINT)")
      .collect().filter(_.getLong(1) == america).map(_.getLong(0)).toSet
    val nodes = edges.keys.flatMap(k => Seq(k._1, k._2)).toSet.toSeq.sorted
    val start = 1000000000000L
    val teleport = start / seeds.size * 15L / 100L
    var pr = nodes.map(n =>
      n -> (if (seeds(n)) start / seeds.size else 0L)).toMap
    for (_ <- 1 to 3) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case ((u, v), w) =>
        inflow(v) = inflow.getOrElse(v, 0L) + pr(u) / outw(u) * w
      }
      pr = nodes.map(n => n -> (inflow.getOrElse(n, 0L) * 85L / 100L +
        (if (seeds(n)) teleport else 0L))).toMap
    }
    val got = PprOps.q513PersonalizedPagerank.fn(spark, sfDir).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue)
      .toMap
    assert(got == pr, s"got $got\ntruth $pr")
  }

  test("q514: Kalman fold equals a literal sequential replay") {
    val daily = Tables(spark, sfDir).orders
      .selectExpr("o_orderpriority",
        "CAST(CAST(o_orderdate AS DATE) AS STRING) AS day",
        "o_totalprice").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(x => (x._1, x._2)).view.mapValues(rows =>
        rows.map(r => math.floor(r._3 * 100 + 0.5).toLong).sum / 100000L)
      .toSeq
    val truth = daily.groupBy(_._1._1).map { case (cls, rows) =>
      val ser = rows.sortBy(_._1._2).map(_._2)
      var lvl = ser.head.toDouble; var p = 10.0; var k = 0.0
      ser.tail.foreach { z =>
        val ppred = p + 0.1
        k = ppred / (ppred + 10.0)
        lvl = lvl + k * (z.toDouble - lvl)
        p = (1.0 - k) * ppred
      }
      def r(x: Double, n: Int) =
        BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
      (cls, ser.length.toLong, r(lvl, 6), r(k, 9), r(p, 9))
    }.toSet
    val got = KalmanOps.q514KalmanFilter.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q515: CCF equals a literal integer-sum replay") {
    val ev = Tables(spark, sfDir).events
      .selectExpr("event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 AS h")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .filter(e => e._1 == "view" || e._1 == "purchase")
    val h0 = ev.map(_._2).min; val h1 = ev.map(_._2).max
    val xs = (h0 to h1).map(h => ev.count(e => e._1 == "view" && e._2 == h).toLong)
    val ys = (h0 to h1).map(h => ev.count(e => e._1 == "purchase" && e._2 == h).toLong)
    val truth = (-12 to 12).flatMap { lag =>
      val pairs = xs.indices.flatMap { i =>
        val j = i + lag
        if (j >= 0 && j < ys.length) Some((xs(i), ys(j))) else None
      }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      if (vx > 0 && vy > 0) {
        val r = (n * sxy - sx * sy).toDouble /
          (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))
        Some((lag.toLong, n,
          BigDecimal(r).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      } else None
    }.toSet
    val got = CcfOps.q515LeadLagCcf.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q516: per-lang BLEU equals a literal clipped-precision replay") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] =
      "\\w+".r.findAllIn(t.toLowerCase(java.util.Locale.ROOT)).toSeq
    val truth = docs.map(d => (d._1, d._2, toks(d._3)))
      .filter(_._3.length >= 2)
      .groupBy(_._2).map { case (lang, ds) =>
        val ordered = ds.sortBy(_._1)
        val pairs = ordered.grouped(2).filter(_.length == 2).toSeq
        val bms = pairs.map { pr =>
          val cand = pr(0)._3; val ref = pr(1)._3
          def cnt(g: Seq[String]) =
            g.groupBy(identity).view.mapValues(_.length.toLong).toMap
          def clip(c: Map[String, Long], r: Map[String, Long]) =
            c.map { case (g, n) => math.min(n, r.getOrElse(g, 0L)) }.sum
          val (c1, r1) = (cnt(cand), cnt(ref))
          def bigrams(t: Seq[String]) = t.zip(t.tail).map(p => p._1 + " " + p._2)
          val (c2, r2) = (cnt(bigrams(cand)), cnt(bigrams(ref)))
          val p1 = clip(c1, r1).toDouble / cand.length
          val p2 = clip(c2, r2).toDouble / (cand.length - 1)
          val bp = math.min(1.0, math.exp(1.0 - ref.length.toDouble / cand.length))
          math.floor(bp * math.sqrt(p1 * p2) * 1e6).toLong
        }
        (lang, pairs.length.toLong, bms.sum,
          BigDecimal(bms.sum.toDouble / pairs.length / 1e6)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
    val got = BleuOps.q516Bleu.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }
}
