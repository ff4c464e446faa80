package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for wave q452–q454: a full driver-side Newton replay
  * of the Cox partial likelihood (plus the U(0) ≡ log-rank O−E
  * identity), a Cochran–Armitage replay, and a BRUTE-FORCE pairwise
  * Jonckheere–Terpstra cross-proof — the engine computes JT without
  * pairing, so agreement with the O(n²) definition proves the prefix
  * identity.
  */
class CoxOpsSpec extends SparkTestBase {

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q452: Newton replay and the U(0) = log-rank identity") {
    val row = CoxOps.q452CoxPh.fn(spark, sfDir).head()
    // rebuild subjects driver-side
    val o = Tables(spark, sfDir).orders
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"),
        col("o_orderpriority"), col("o_orderkey")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
    val hz = o.map(_._2).max
    val subj = o.groupBy(_._1).map { case (_, rows) =>
      val sorted = rows.sortBy(x => (x._2, x._4))
      val first = sorted.head
      val x = if (first._3 == "1-URGENT") 1L else 0L
      if (sorted.length >= 2) (x, sorted(1)._2 - first._2, 1L)
      else (x, hz - first._2, 0L)
    }.toSeq
    assert(row.getAs[Long]("n_subjects") == subj.size.toLong)
    assert(row.getAs[Long]("n_events") == subj.count(_._3 == 1L).toLong)
    // event spine with Breslow risk sets
    val eventTimes = subj.filter(_._3 == 1L).groupBy(_._2).map {
      case (t, es) => (t, es.size.toLong, es.map(_._1).sum)
    }.toSeq.sortBy(_._1)
    def riskCounts(t: Long): (Long, Long) = {
      val at = subj.filter(_._2 >= t)
      (at.count(_._1 == 0L).toLong, at.count(_._1 == 1L).toLong)
    }
    val spine = eventTimes.map { case (t, d, sx) =>
      val (n0, n1) = riskCounts(t); (d, sx, n0, n1)
    }
    def uAndI(beta: Double): (Double, Double) = {
      val eb = math.exp(beta)
      var uL = BigInt(0); var iL = BigInt(0)
      spine.foreach { case (d, sx, n0, n1) =>
        val pi = n1 * eb / (n0 + n1 * eb)
        uL += BigInt(math.round((sx - d * pi) * 1e9))
        iL += BigInt(math.round(d * pi * (1 - pi) * 1e9))
      }
      (uL.toDouble / 1e9, iL.toDouble / 1e9)
    }
    var beta = 0.0
    val (u0, _) = uAndI(0.0)
    assert(row.getAs[Double]("logrank_o_minus_e") == r(u0, 4),
      "U(0) is the log-rank O-E")
    (1 to 3).foreach { _ =>
      val (u, i) = uAndI(beta)
      beta = r(beta + u / i, 9)
    }
    assert(row.getAs[Double]("beta") == r(beta, 6), "Newton replay")
    assert(row.getAs[Double]("hazard_ratio") == r(math.exp(beta), 6))
    val (_, iF) = uAndI(beta)
    assert(row.getAs[Double]("se") == r(1.0 / math.sqrt(iF), 6))
  }

  test("q453: trend replay and rate-monotonicity reporting") {
    val rows = OrderedAltOps.q453CochranArmitage.fn(spark, sfDir).collect()
    assert(rows.length == 5)
    val cells = rows.map(x => (x.getAs[Long]("score"),
      x.getAs[Long]("n_i"), x.getAs[Long]("r_i")))
    val nn = cells.map(_._2).sum.toDouble
    val rr = cells.map(_._3).sum.toDouble
    val pbar = rr / nn
    val tnum = (nn * cells.map(c => c._1 * c._3).sum
      - rr * cells.map(c => c._1 * c._2).sum) / nn
    val vden = pbar * (1 - pbar) * (cells.map(c => c._1 * c._1 * c._2).sum
      - math.pow(cells.map(c => c._1 * c._2).sum, 2) / nn)
    assert(rows.head.getAs[Double]("z") == r(tnum / math.sqrt(vden), 6))
    rows.foreach { x =>
      assert(x.getAs[Double]("chi2_trend") ==
        r(x.getAs[Double]("z") * x.getAs[Double]("z"), 6))
    }
  }

  test("q454: prefix identity equals the brute-force pairwise JT") {
    val row = OrderedAltOps.q454JonckheereTerpstra.fn(spark, sfDir).head()
    val o = Tables(spark, sfDir).orders
      .select(substring(col("o_orderpriority"), 1, 1).cast("long"),
        col("o_totalprice").cast("decimal(18,2)")).collect()
      .map(x => (x.getLong(0), BigDecimal(x.getDecimal(1))))
    assert(row.getAs[Long]("n_orders") == o.length.toLong)
    // brute force over all cross-group pairs (sf0.001: ~1M pairs)
    var jt2 = 0L
    for (gi <- 1L to 4L; gj <- (gi + 1) to 5L) {
      val a = o.filter(_._1 == gi).map(_._2).sorted
      val b = o.filter(_._1 == gj).map(_._2)
      b.foreach { v =>
        // binary search: #a < v and #a == v
        val lt = a.count(_ < v)
        val eq = a.count(_ == v)
        jt2 += 2L * lt + eq
      }
    }
    assert(row.getAs[Double]("jt") == jt2 / 2.0,
      s"prefix JT ${row.getAs[Double]("jt")} vs brute ${jt2 / 2.0}")
    val e = row.getAs[Double]("e_jt")
    val v = row.getAs[Double]("var_jt")
    assert(v > 0)
    assert(row.getAs[Double]("z") ==
      r((row.getAs[Double]("jt") - e) / math.sqrt(v), 6) ||
      math.abs(row.getAs[Double]("z") -
        (row.getAs[Double]("jt") - e) / math.sqrt(v)) < 1e-4)
  }
}
