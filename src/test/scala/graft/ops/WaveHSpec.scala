package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** Wave q521–q524 semantics against literal driver-side replays on
  * sf0.001. */
class WaveHSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def toks(t: String): Seq[String] =
    "\\w+".r.findAllIn(t.toLowerCase(java.util.Locale.ROOT)).toSeq

  /** Undirected trade edges (same literal recompute as WaveFSpec). */
  private lazy val tradeUndirected: Map[(Long, Long), Long] = {
    val nk = Tables(spark, sfDir).supplier
      .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables(spark, sfDir).lineitem
      .selectExpr("l_partkey", "l_suppkey",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val und = scala.collection.mutable.Map.empty[(Long, Long), Long]
    li.groupBy(_._1).values.foreach { rows =>
      val seq = rows.sortBy(r => (r._3, r._2))
      seq.zip(seq.tail).foreach { case ((_, s1, _), (_, s2, _)) =>
        if (s1 != s2 && nk(s1) != nk(s2)) {
          val k = (math.min(nk(s1), nk(s2)), math.max(nk(s1), nk(s2)))
          und(k) = und.getOrElse(k, 0L) + 1
        }
      }
    }
    und.toMap
  }

  test("q521: per-source CDC dedup equals a literal chunk walk") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def isCut(tok: String): Boolean =
      BigInt(md5hex(s"cdc|$tok").substring(0, 15), 16) % 64 == 0
    // (doc, source, chunkText, mass)
    val chunks = docs.flatMap { case (id, src, text) =>
      val ts = toks(text)
      if (ts.isEmpty) Nil
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
        var cur = scala.collection.mutable.ArrayBuffer.empty[String]
        ts.foreach { t =>
          cur += t
          if (isCut(t)) { out += ((id, src, cur.mkString(" "), cur.length.toLong)); cur.clear() }
        }
        if (cur.nonEmpty) out += ((id, src, cur.mkString(" "), cur.length.toLong))
        out
      }
    }
    val nDocsPerText = chunks.groupBy(_._3).view
      .mapValues(_.map(_._1).distinct.size).toMap
    val truth = chunks.groupBy(_._2).map { case (src, cs) =>
      val total = cs.map(_._4).sum
      val dup = cs.filter(c => nDocsPerText(c._3) > 1).map(_._4).sum
      (src, cs.length.toLong, total, dup, 1000000L * dup / total)
    }.toSet
    val got = CdcChunkOps.q521CdcChunking.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q522: backbone assortativity equals the literal Newman formula") {
    val edges = tradeUndirected.toSeq.map { case ((a, b), w) => (a, b, w) }
    val e = edges.size
    val tau = edges.sortBy { case (a, b, w) => (w, a, b) }
      .apply(math.ceil(e * 0.75).toInt - 1)._3
    val strong = edges.filter(_._3 >= tau).map(x => (x._1, x._2))
    val deg = strong.flatMap(x => Seq(x._1, x._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ends = strong.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val m = ends.size.toLong
    val sjk = ends.map(p => p._1 * p._2).sum
    val sj = ends.map(p => p._1 + p._2).sum
    val sq = ends.map(p => p._1 * p._1 + p._2 * p._2).sum
    val r = (m.toDouble * sjk - (sj.toDouble / 2) * (sj.toDouble / 2)) /
      (m.toDouble * sq / 2 - (sj.toDouble / 2) * (sj.toDouble / 2))
    val row = NetStructOps.q522Assortativity.fn(spark, sfDir).collect().head
    assert(row.getAs[Long]("m") == m)
    assert(row.getAs[Double]("assortativity") ==
      BigDecimal(r).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q523: rich-club sweep equals the literal census") {
    val edges = tradeUndirected.keys.toSeq
    val deg = edges.flatMap(x => Seq(x._1, x._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = Seq(2L, 4L, 6L, 8L).flatMap { k =>
      val club = deg.filter(_._2 > k).keySet
      if (club.isEmpty) None
      else {
        val nk = club.size.toLong
        val ek = edges.count(e => club(e._1) && club(e._2)).toLong
        Some((k, nk, ek,
          BigDecimal(2.0 * ek / (nk * (nk - 1)))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toSet
    val got = NetStructOps.q523RichClub.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q524: reciprocity equals the literal directed census") {
    val nk = Tables(spark, sfDir).supplier
      .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables(spark, sfDir).lineitem
      .selectExpr("l_partkey", "l_suppkey",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d = scala.collection.mutable.Set.empty[(Long, Long)]
    li.groupBy(_._1).values.foreach { rows =>
      val seq = rows.sortBy(r => (r._3, r._2))
      seq.zip(seq.tail).foreach { case ((_, s1, _), (_, s2, _)) =>
        if (s1 != s2 && nk(s1) != nk(s2)) d += ((nk(s1), nk(s2)))
      }
    }
    val n = d.size.toLong
    val recip = d.count(e => d((e._2, e._1))).toLong
    val row = NetStructOps.q524Reciprocity.fn(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_edges") == n)
    assert(row.getAs[Long]("n_recip") == recip)
    assert(row.getAs[Double]("reciprocity") ==
      BigDecimal(recip.toDouble / n)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
