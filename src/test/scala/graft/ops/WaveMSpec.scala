package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** Wave q541–q543 semantics against literal driver-side replays on
  * sf0.001. */
class WaveMSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def toks(t: String): Seq[String] =
    "\\w+".r.findAllIn(t.toLowerCase(java.util.Locale.ROOT)).toSeq

  test("q541: Fleiss kappa equals the literal vote census") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val langs = docs.map(_._2).distinct.sorted
    val idx = langs.zipWithIndex.map { case (l, i) => l -> i.toLong }.toMap
    val nL = langs.length.toLong
    val votes = for (d <- docs; a <- 1 to 3) yield {
      val h = (BigInt(md5hex(s"ann$a|${d._1}").substring(0, 15), 16) % 10).toLong
      (d._1, if (h < 7) idx(d._2) else (idx(d._2) + 1 + (h - 7)) % nL)
    }
    val ssq = votes.groupBy(identity).values.map(g => g.size.toLong)
      .map(c => c * c) // Σ n_ij² grouped by (doc, cat)
      .sum
    val nSubj = docs.length.toLong
    val pbar = (ssq - nSubj * 3).toDouble / (nSubj.toDouble * 3 * 2)
    val catTot = votes.groupBy(_._2).values.map(_.size.toLong)
    val tot = catTot.sum
    val pe = catTot.map(c => c * c).sum.toDouble / (tot.toDouble * tot)
    val row = AgreementOps.q541FleissKappa.fn(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_subjects") == nSubj)
    assert(row.getAs[Double]("pbar") == r9(pbar))
    assert(row.getAs[Double]("pe") == r9(pe))
    assert(row.getAs[Double]("fleiss_kappa") == r9((pbar - pe) / (1.0 - pe)))
  }

  test("q542: per-class MCC equals the literal confusion algebra") {
    val m = NaiveBayesOps.q511NaiveBayes.fn(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val langs = m.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct
    val total = m.values.sum
    val truth = langs.map { l =>
      val tp = m.getOrElse((l, l), 0L)
      val rowT = m.collect { case ((t, _), n) if t == l => n }.sum
      val colT = m.collect { case ((_, p), n) if p == l => n }.sum
      val fp = colT - tp; val fn = rowT - tp
      val tn = total - rowT - colT + tp
      val prod = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
      val defined = if (prod > 0) 1L else 0L
      val mcc = if (prod > 0)
        r9((tp.toDouble * tn - fp.toDouble * fn) /
          math.sqrt((tp + fp).toDouble *
            ((tp + fn).toDouble * ((tn + fp).toDouble * (tn + fn)))))
      else 0.0
      (l, tp, fp, fn, tn, defined, mcc)
    }.toSet
    val got = AgreementOps.q542MccOvr.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q543: RBO equals the literal depth-overlap walk") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
    val truth = Seq("scan", "join", "window", "stream").map { term =>
      val postings = docs.map { case (id, ts) =>
        (id, ts.count(_ == term).toLong, ts.length.toLong) }
        .filter(_._2 > 0)
      val a = postings.sortBy { case (id, tf, _) => (-tf, id) }
        .map(_._1).take(10)
      val b = postings.sortBy { case (id, tf, dl) =>
        (-(tf * 1000 / dl), id) }.map(_._1).take(10)
      var rbo = 0L
      var ov10 = 0L
      (1 to 10).foreach { d =>
        val ov = (a.take(d).toSet & b.take(d).toSet).size.toLong
        if (d == 10) ov10 = ov
        rbo += math.floor(1e6 * 0.1 * math.pow(0.9, d - 1) * ov / d).toLong
      }
      (term, rbo, ov10)
    }.toSet
    val got = RboOps.q543Rbo.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }
}
