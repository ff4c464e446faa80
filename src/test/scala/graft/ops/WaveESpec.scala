package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** Wave q508–q511 semantics, each against a literal driver-side replay
  * on sf0.001 (the house discipline: the relational plan must equal a
  * straight-line recompute in the query's own units). */
class WaveESpec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def coord(key: Long, salt: String): Long =
    (BigInt(md5hex(s"$salt$key").substring(0, 15), 16) % 10000L).toLong

  /** The 10×10 lattice of customer counts (empty cells present). */
  private def lattice(): Array[Array[Long]] = {
    val cells = Array.fill(10, 10)(0L)
    Tables(spark, sfDir).customer.select("c_custkey").collect()
      .map(_.getLong(0)).foreach { k =>
        cells(coord(k, "cx|").toInt / 1000)(coord(k, "cy|").toInt / 1000) += 1
      }
    cells
  }

  test("q508: Moran's I equals the literal lattice recompute") {
    val cells = lattice()
    val n = 100L
    val t = cells.flatten.sum
    val v = cells.map(_.map(x => n * x - t))
    var num = 0L; var wsum = 0L; var den = 0L
    for (i <- 0 until 10; j <- 0 until 10) {
      den += v(i)(j) * v(i)(j)
      for ((di, dj) <- Seq((0, 1), (0, -1), (1, 0), (-1, 0))) {
        val (a, b) = (i + di, j + dj)
        if (a >= 0 && a < 10 && b >= 0 && b < 10) {
          num += v(i)(j) * v(a)(b); wsum += 1
        }
      }
    }
    val row = SpatialStatOps.q508MoransI.fn(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_cells") == n)
    assert(row.getAs[Long]("w_pairs") == wsum)
    assert(row.getAs[Double]("morans_i") ==
      n.toDouble * num / (wsum.toDouble * den))
    assert(row.getAs[Double]("e_i") == -1.0 / (n - 1))
  }

  test("q509: Gi* top-10 equals the literal neighborhood recompute") {
    val cells = lattice()
    val n = 100L
    val t = cells.flatten.sum
    val t2 = cells.flatten.map(x => x * x).sum
    val truth = (for (i <- 0 until 10; j <- 0 until 10) yield {
      var hood = 0L; var wi = 0L
      for (a <- (i - 1) to (i + 1); b <- (j - 1) to (j + 1)
           if a >= 0 && a < 10 && b >= 0 && b < 10) {
        hood += cells(a)(b); wi += 1
      }
      // mirror the query's expression order exactly (same IEEE ops)
      val gi = (hood - t.toDouble / n * wi) /
        (math.sqrt(t2.toDouble / n - (t.toDouble / n) * (t.toDouble / n)) *
          math.sqrt((n.toDouble * wi - wi * wi) / (n - 1)))
      (i.toLong, j.toLong, cells(i)(j), hood, wi,
        BigDecimal(gi).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).sortBy { case (gx, gy, _, _, _, gi) => (-gi, gx, gy) }.take(10)
    val got = SpatialStatOps.q509GetisOrd.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("gx"), r.getAs[Long]("gy"), r.getAs[Long]("x"),
        r.getAs[Long]("hood_sum"), r.getAs[Long]("wi"),
        r.getAs[Double]("gi_star")))
    assert(got.toSeq == truth.toSeq,
      s"got ${got.mkString(", ")}\ntruth ${truth.mkString(", ")}")
  }

  test("q510: Engle–Granger stats equal the literal two-step replay") {
    val daily = Tables(spark, sfDir).orders
      .selectExpr("CAST(CAST(o_orderdate AS DATE) AS STRING) AS day",
        "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues { rows =>
        (rows.length.toLong,
          rows.map(r => math.floor(r._2 * 100 + 0.5).toLong).sum / 100000L)
      }.toSeq.sortBy(_._1).map(_._2)
    val n = daily.length.toDouble
    val sx = daily.map(_._1).sum.toDouble
    val sy = daily.map(_._2).sum.toDouble
    val sxx = daily.map(d => d._1 * d._1).sum.toDouble
    val sxy = daily.map(d => d._1 * d._2).sum.toDouble
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val u = daily.map(d => math.floor(d._2.toDouble - a - b * d._1.toDouble + 0.5).toLong)
    val pairs = u.zip(u.tail) // (u_{t-1}, u_t)
    val sud = pairs.map { case (up, ut) => up * (ut - up) }.sum
    val suu = pairs.map { case (up, _) => up * up }.sum
    val sdd = pairs.map { case (up, ut) => (ut - up) * (ut - up) }.sum
    val tN = pairs.length.toLong
    val rho = sud.toDouble / suu
    val adfT = rho / math.sqrt(
      ((sdd - sud.toDouble * sud / suu) / (tN - 1)) / suu)
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = CointegOps.q510Cointegration.fn(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_days") == daily.length.toLong)
    assert(row.getAs[Double]("slope") == r9(b))
    assert(row.getAs[Double]("rho") == r9(rho))
    assert(row.getAs[Double]("adf_t") == r9(adfT))
  }

  test("q511: confusion matrix equals a literal NB train/score replay") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] =
      "\\w+".r.findAllIn(t.toLowerCase(java.util.Locale.ROOT)).toSeq
    val train = docs.filter(_._1 % 2 == 0)
    val test  = docs.filter(_._1 % 2 == 1)
    val vocab = train.flatMap(d => toks(d._3)).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(200).map(_._1).toSet

    val langs = train.map(_._2).distinct.sorted
    val nDocs = langs.map(l => l -> train.count(_._2 == l).toLong).toMap
    val nAll = train.length.toLong
    val prior = langs.map(l =>
      l -> math.floor(math.log(nDocs(l).toDouble / nAll) * 1e6).toLong).toMap
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
    train.foreach { case (_, l, t) =>
      toks(t).filter(vocab).foreach(tok =>
        cnt((l, tok)) = cnt.getOrElse((l, tok), 0L) + 1) }
    val tot = langs.map(l =>
      l -> cnt.collect { case ((`l`, _), c) => c }.sum).toMap
    def lp(l: String, tok: String): Long =
      math.floor(math.log((cnt.getOrElse((l, tok), 0L) + 1).toDouble /
        (tot(l) + 200)) * 1e6).toLong

    val confusion = scala.collection.mutable.Map.empty[(String, String), Long]
    test.filter(d => toks(d._3).nonEmpty).foreach { case (_, trueL, t) =>
      val tf = toks(t).filter(vocab).groupBy(identity)
        .map { case (tok, xs) => (tok, xs.length.toLong) }
      val pred = langs.map { l =>
        (l, prior(l) + tf.map { case (tok, c) => c * lp(l, tok) }.sum)
      }.minBy { case (l, s) => (-s, l) }._1
      confusion((trueL, pred)) = confusion.getOrElse((trueL, pred), 0L) + 1
    }
    val got = NaiveBayesOps.q511NaiveBayes.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("true_lang"), r.getAs[String]("pred_lang")) ->
        r.getAs[Long]("n")).toMap
    assert(got == confusion.toMap,
      s"got $got\ntruth ${confusion.toMap}")
  }
}
