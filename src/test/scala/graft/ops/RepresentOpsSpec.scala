package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the representation & release wave (q369–q371):
  * CKA against a dense Scala recomputation + the Cauchy–Schwarz bound,
  * distinct-n laws against a brute-forced source, and the exponential
  * mechanism's normalization/unimodality/argmax contracts.
  */
class RepresentOpsSpec extends SparkTestBase {

  test("q369: CKA matches a dense recomputation and respects Cauchy-Schwarz") {
    val r = RepresentOps.q369CkaRedundancy.fn(spark, sfDir).collect().head
    val cka = r.getAs[Double]("cka")
    // Cauchy–Schwarz for the Frobenius inner product (‖XᵀY‖²F ≤
    // ‖XᵀX‖F·‖YᵀY‖F) IS the cka ≤ 1 bound
    assert(cka > 0.0 && cka <= 1.0 + 1e-9)
    assert(math.abs(r.getAs[Double]("cross_mass") -
      cka * math.sqrt(r.getAs[Double]("head_mass") * r.getAs[Double]("tail_mass")))
      < 1e-2 * r.getAs[Double]("cross_mass") + 1.0)
    // dense recomputation (no per-term rounding — tolerance absorbs it)
    val vecs = Tables(spark, sfDir).embeddings
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    val d = 64
    val mu = Array.tabulate(d)(k => vecs.map(_(k)).sum / n)
    val c = vecs.map(v => Array.tabulate(d)(k => v(k) - mu(k)))
    def gram(ps: Range, qs: Range): Array[Array[Double]] =
      ps.map(p => qs.map(q => c.map(row => row(p) * row(q)).sum).toArray).toArray
    def fro2(m: Array[Array[Double]]): Double = m.flatten.map(x => x * x).sum
    val sxy = fro2(gram(0 until 32, 32 until 64))
    val sxx = fro2(gram(0 until 32, 0 until 32))
    val syy = fro2(gram(32 until 64, 32 until 64))
    val exp = sxy / math.sqrt(sxx * syy)
    assert(math.abs(cka - exp) < 1e-3, s"cka $cka != dense $exp")
    assert(r.getAs[Long]("n") == n.toLong)
  }

  test("q370: distinct-n ratios are in (0,1], grow with n, and brute-force per source") {
    val rows = RepresentOps.q370DistinctN.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d1, d2, d3) = (r.getAs[Double]("distinct_1"),
        r.getAs[Double]("distinct_2"), r.getAs[Double]("distinct_3"))
      Seq(d1, d2, d3).foreach(x => assert(x > 0.0 && x <= 1.0))
      // longer n-grams are more unique in any non-degenerate corpus
      assert(d1 <= d2 && d2 <= d3, s"${r.getAs[String]("source")}: $d1, $d2, $d3 not monotone")
    }
    val src = rows.head.getAs[String]("source")
    val texts = Tables(spark, sfDir).documents
      .filter(col("source") === src).select(col("text"))
      .collect().map(_.getString(0))
    val re = java.util.regex.Pattern.compile("\\w+")
    def toks(t: String): Seq[String] = {
      val m = re.matcher(t.toLowerCase)
      Iterator.continually(if (m.find()) Some(m.group) else None)
        .takeWhile(_.isDefined).flatten.toSeq
    }
    def dn(n: Int): (Long, Long) = {
      val gs = texts.map(toks).filter(_.length >= n)
        .flatMap(_.sliding(n).map(_.mkString(" ")))
      (gs.length.toLong, gs.distinct.length.toLong)
    }
    val (t1, u1) = dn(1); val (_, u2) = dn(2)._1 -> dn(2)._2
    assert(rows.head.getAs[Long]("n_tokens") == t1)
    assert(math.abs(rows.head.getAs[Double]("distinct_1") -
      math.rint(u1.toDouble / t1 * 1e6) / 1e6) < 1e-9)
    assert(math.abs(rows.head.getAs[Double]("distinct_2") -
      math.rint(u2.toDouble / dn(2)._1 * 1e6) / 1e6) < 1e-9)
  }

  test("q371: the release distribution normalizes, is unimodal, and peaks at the true median") {
    val rows = RepresentOps.q371DpExpMedian.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("bkt"))
    assert(rows.length == 32)
    val ps = rows.map(_.getAs[Double]("p_select"))
    assert(math.abs(ps.sum - 1.0) < 1e-6, s"release distribution sums to ${ps.sum}")
    // unimodal: strictly non-decreasing to the peak, non-increasing after
    val peak = ps.indexOf(ps.max)
    assert(ps.take(peak + 1).sliding(2).forall(p => p.length < 2 || p(0) <= p(1) + 1e-12))
    assert(ps.drop(peak).sliding(2).forall(p => p.length < 2 || p(0) >= p(1) - 1e-12))
    // the peak is the candidate whose boundary sits closest to the median
    val n = rows.head.getAs[Long]("n").toDouble
    val dists = rows.map(r => math.abs(r.getAs[Long]("below") / n - 0.5))
    assert(peak == dists.indexOf(dists.min),
      s"peak bucket $peak != closest-to-median bucket ${dists.indexOf(dists.min)}")
    // rank mass is conserved
    assert(rows.map(_.getAs[Long]("cnt")).sum == rows.head.getAs[Long]("n"))
  }
}
