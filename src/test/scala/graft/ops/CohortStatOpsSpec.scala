package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the collocation & cohort wave (q381–q382):
  * G² recomputed per published bigram (and its KL ≥ 0 law), and the
  * log-rank statistic against a full Scala brute force including the
  * group-swap antisymmetry.
  */
class CohortStatOpsSpec extends SparkTestBase {

  test("q381: G2 >= 0, ranks ordered, and each published value recomputes from counts") {
    val rows = CohortStatOps.q381LlrCollocations.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("rk"))
    assert(rows.length == 20)
    val g2s = rows.map(_.getAs[Double]("g2"))
    assert(g2s.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)), "not rank-ordered")
    g2s.foreach(g => assert(g >= 0.0, s"G2 $g negative — KL law broken"))
    // recompute marginals from raw text
    val texts = Tables(spark, sfDir).documents.select(col("text")).collect()
      .map(_.getString(0))
    val re = java.util.regex.Pattern.compile("\\w+")
    val bgs = texts.flatMap { t =>
      val m = re.matcher(t.toLowerCase)
      val toks = Iterator.continually(if (m.find()) Some(m.group) else None)
        .takeWhile(_.isDefined).flatten.toArray
      if (toks.length >= 2) toks.sliding(2).map(p => (p(0), p(1))) else Iterator.empty
    }
    val n = bgs.length.toDouble
    val k11m = bgs.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    val r1m = bgs.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val c2m = bgs.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val k11 = k11m((w1, w2)); val row1 = r1m(w1); val col2 = c2m(w2)
      val cells = Seq(
        (k11, row1 * col2), (row1 - k11, row1 * (n - col2)),
        (col2 - k11, (n - row1) * col2), (n - row1 - col2 + k11, (n - row1) * (n - col2)))
      val g2 = 2.0 * cells.map { case (k, e) =>
        if (k > 0) k * math.log(k * n / e) else 0.0
      }.sum
      assert(r.getAs[Long]("k11") == k11.toLong)
      assert(math.abs(r.getAs[Double]("g2") - math.rint(g2 * 1e6) / 1e6) < 2e-6,
        s"($w1,$w2): g2 ${r.getAs[Double]("g2")} != brute-forced $g2")
    }
  }

  test("q382: statistic matches the brute force and is antisymmetric under group swap") {
    val r = CohortStatOps.q382LogrankTest.fn(spark, sfDir).collect().head
    val su = EventOps.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
      .groupBy(_._1).map { case (uid, evs) =>
        val t0 = evs.map(_._2).min
        val tp = evs.filter(_._3 == "purchase").map(_._2).minOption
        val t = tp.getOrElse(evs.map(_._2).max) - t0
        ((uid % 2).toInt, t, tp.isDefined)
      }.toSeq
    def logrank(g1: Int): (Long, Double, Double) = {
      val times = su.map(_._2).distinct.sorted
      var (o, e, v) = (0L, BigDecimal(0), BigDecimal(0))
      times.foreach { tj =>
        val at = su.filter(_._2 >= tj)
        val r1 = at.count(_._1 == g1); val rr = at.size
        val d1 = su.count(x => x._1 == g1 && x._2 == tj && x._3)
        val dd = su.count(x => x._2 == tj && x._3)
        if (dd > 0 && rr > 1) {
          o += d1
          e += BigDecimal(dd.toDouble * r1 / rr).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          v += BigDecimal(dd.toDouble * (r1.toDouble / rr) * (1.0 - r1.toDouble / rr) *
            (rr - dd).toDouble / (rr - 1)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
      }
      (o, e.toDouble, v.toDouble)
    }
    val (o1, e1, v1) = logrank(0)
    assert(r.getAs[Long]("o1") == o1)
    assert(math.abs(r.getAs[Double]("e1") - math.rint(e1 * 1e6) / 1e6) < 2e-6)
    val z = (o1 - e1) / math.sqrt(v1)
    assert(math.abs(r.getAs[Double]("z") - math.rint(z * 1e6) / 1e6) < 2e-6,
      s"z ${r.getAs[Double]("z")} != brute-forced $z")
    // antisymmetry: the other cohort's z is the negation (same variance)
    val (o2, e2, v2) = logrank(1)
    assert(math.abs((o1 - e1) + (o2 - e2)) < 1e-6, "O-E must sum to zero across cohorts")
    assert(math.abs(v1 - v2) < 1e-6)
    assert(math.abs(r.getAs[Double]("chi2") - math.rint(z * z * 1e6) / 1e6) < 2e-5)
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") == su.size.toLong)
  }
}
