package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** Wave q517–q520 semantics against literal driver-side replays on
  * sf0.001. */
class WaveGSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def toks(t: String): Seq[String] =
    "\\w+".r.findAllIn(t.toLowerCase(java.util.Locale.ROOT)).toSeq

  private lazy val docs: Array[(Long, String, String, Long)] =
    Tables(spark, sfDir).documents
      .select("doc_id", "lang", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("q517: regimes equal a literal fwd/bwd max-marginal replay") {
    val daily = Tables(spark, sfDir).orders
      .selectExpr("CAST(CAST(o_orderdate AS DATE) AS STRING) AS day")
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val n = daily.length
    val byX = daily.sortBy { case (d, x) => (x, d) }.map(_._2)
    val t1 = byX(math.ceil(n / 3.0).toInt - 1)
    val t2 = byX(math.ceil(2.0 * n / 3.0).toInt - 1)
    val obs = daily.map { case (d, x) =>
      (d, if (x <= t1) 0 else if (x <= t2) 1 else 2) }
    val lnSelf = math.floor(math.log(0.8) * 1e6).toLong
    val lnMove = math.floor(math.log(0.1) * 1e6).toLong
    val lnHit  = math.floor(math.log(0.6) * 1e6).toLong
    val lnMiss = math.floor(math.log(0.2) * 1e6).toLong
    def e(o: Int, s: Int) = if (o == s) lnHit else lnMiss
    def tr(a: Int, b: Int) = if (a == b) lnSelf else lnMove
    val fwd = Array.ofDim[Long](n, 3)
    for (s <- 0 to 2) fwd(0)(s) = e(obs(0)._2, s)
    for (t <- 1 until n; s <- 0 to 2)
      fwd(t)(s) = (0 to 2).map(sp => fwd(t - 1)(sp) + tr(sp, s)).max +
        e(obs(t)._2, s)
    val bwd = Array.ofDim[Long](n, 3)
    for (t <- n - 2 to 0 by -1; s <- 0 to 2)
      bwd(t)(s) = (0 to 2).map(sp =>
        tr(s, sp) + e(obs(t + 1)._2, sp) + bwd(t + 1)(sp)).max
    val state = (0 until n).map { t =>
      val m = (0 to 2).map(s => fwd(t)(s) + bwd(t)(s))
      m.indexOf(m.max).toLong
    }
    // islands
    val islands = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && state(j + 1) == state(i)) j += 1
      islands += ((obs(i)._1, state(i), (j - i + 1).toLong))
      i = j + 1
    }
    val truth = islands.sortBy { case (d, _, len) => (-len, d) }.take(10)
      .map { case (d, s, len) => (d, s, len) }
    val got = HmmOps.q517HmmRegimes.fn(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == truth.toSeq, s"got ${got.toSeq}\ntruth ${truth.toSeq}")
  }

  test("q518: MMR picks equal a literal greedy replay") {
    val pool = docs.map(d => (d._1, d._4, toks(d._3)))
      .filter(_._3.length >= 3)
      .sortBy { case (id, nc, _) => (-nc, id) }.take(30)
    val maxChars = pool.map(_._2).max
    val rel = pool.map { case (id, nc, _) => id -> 1000000L * nc / maxChars }.toMap
    val sh = pool.map { case (id, _, ts) =>
      id -> ts.sliding(3).map(_.mkString(" ")).toSet }.toMap
    def sim(a: Long, b: Long): Long = {
      val (x, y) = (sh(a), sh(b))
      val i = (x & y).size.toLong
      if (i == 0) 0L else 1000000L * i / (x.size + y.size - i)
    }
    var selected = Vector.empty[(Long, Long)]
    var remaining = rel.keySet
    for (_ <- 1 to 10 if remaining.nonEmpty) {
      val pick = remaining.map { d =>
        val ms = if (selected.isEmpty) 0L else selected.map(p => sim(d, p._1)).max
        (d, 7L * rel(d) - 3L * ms)
      }.minBy { case (d, sc) => (-sc, d) }
      selected :+= pick
      remaining -= pick._1
    }
    val truth = selected.zipWithIndex
      .map { case ((d, sc), i) => (i + 1L, d, sc) }
    val got = MmrOps.q518MmrDiversify.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == truth, s"got ${got.toSeq}\ntruth $truth")
  }

  test("q519: greedy cover equals a literal replay") {
    val srcDocs = Tables(spark, sfDir).documents.select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val inv: Map[String, Set[String]] = srcDocs.groupBy(_._1).view
      .mapValues(_.flatMap(d => toks(d._2)).toSet).toMap
    val universe = inv.values.flatten.toSet.size.toLong
    var covered = Set.empty[String]
    var picked = Set.empty[String]
    var cum = 0L
    val truth = (1 to 8).map { round =>
      val (src, gain) = (inv.keySet -- picked)
        .map(s => (s, (inv(s) -- covered).size.toLong))
        .minBy { case (s, g) => (-g, s) }
      picked += src; covered ++= inv(src); cum += gain
      (round.toLong, src, gain, cum,
        BigDecimal(cum.toDouble / universe)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = SetCoverOps.q519SetCover.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == truth, s"got ${got.toSeq}\ntruth $truth")
  }

  test("q520: reliability report equals a literal one-round EM replay") {
    val langs = docs.map(_._2).distinct.sorted
    val idx = langs.zipWithIndex.map { case (l, i) => l -> i.toLong }.toMap
    val nL = langs.length.toLong
    val votes = for (d <- docs; a <- 1 to 3) yield {
      val h = (BigInt(md5hex(s"ann$a|${d._1}").substring(0, 15), 16) % 10).toLong
      val v = if (h < 7) idx(d._2)
              else (idx(d._2) + 1 + (h - 7)) % nL
      (d._1, a.toLong, langs(v.toInt))
    }
    // majority init
    val z0 = votes.groupBy(_._1).map { case (doc, vs) =>
      doc -> vs.groupBy(_._3).map { case (l, g) => (l, g.size) }.toSeq
        .minBy { case (l, c) => (-c, l) }._1
    }
    val conf = scala.collection.mutable.Map.empty[(Long, String, String), Long]
    votes.foreach { case (doc, a, v) =>
      val k = (a, z0(doc), v); conf(k) = conf.getOrElse(k, 0L) + 1 }
    val rowTot = conf.groupBy { case ((a, z, _), _) => (a, z) }.view
      .mapValues(_.values.sum).toMap
    val prior = z0.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nDocs = docs.length.toLong
    def lp(a: Long, cls: String, v: String): Long =
      math.floor(math.log((conf.getOrElse((a, cls, v), 0L) + 1).toDouble /
        (rowTot.getOrElse((a, cls), 0L) + nL)) * 1e6).toLong
    def lp0(cls: String): Long =
      math.floor(math.log((prior.getOrElse(cls, 0L) + 1).toDouble /
        (nDocs + nL)) * 1e6).toLong
    val z1 = votes.groupBy(_._1).map { case (doc, vs) =>
      doc -> langs.map { cls =>
        (cls, lp0(cls) + vs.map { case (_, a, v) => lp(a, cls, v) }.sum)
      }.minBy { case (l, sc) => (-sc, l) }._1
    }
    val truth = votes.groupBy { case (doc, a, _) => (a, z1(doc)) }.map {
      case ((a, l), vs) =>
        val nv = vs.size.toLong
        val nm = vs.count { case (doc, _, v) => v == z1(doc) }.toLong
        (a, l, nv, nm, 1000000L * nm / nv)
    }.toSet
    val got = DawidSkeneOps.q520DawidSkene.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }
}
