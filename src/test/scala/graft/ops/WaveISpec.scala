package graft.ops

import graft.SparkTestBase

/** Wave q525–q528 semantics against literal driver-side replays on
  * sf0.001. */
class WaveISpec extends SparkTestBase {

  private def r(x: Double, n: Int) =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Daily (day, count, distinctCust, kilodollars) from a literal walk. */
  private lazy val daily: Seq[(String, Long, Long, Long)] =
    Tables(spark, sfDir).orders
      .selectExpr("CAST(CAST(o_orderdate AS DATE) AS STRING) AS day",
        "o_custkey", "o_totalprice").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2)))
      .groupBy(_._1).toSeq.map { case (d, rows) =>
        (d, rows.length.toLong, rows.map(_._2).distinct.length.toLong,
          rows.map(x => math.floor(x._3 * 100 + 0.5).toLong).sum / 100000L)
      }.sortBy(_._1)

  test("q525: ridge path equals the literal closed-form solve") {
    val n = daily.length.toLong
    val t1 = daily.map(_._2).sum; val t2 = daily.map(_._3).sum
    val ty = daily.map(_._4).sum
    val s11 = n * daily.map(d => d._2 * d._2).sum - t1 * t1
    val s12 = n * daily.map(d => d._2 * d._3).sum - t1 * t2
    val s22 = n * daily.map(d => d._3 * d._3).sum - t2 * t2
    val sy1 = n * daily.map(d => d._2 * d._4).sum - t1 * ty
    val sy2 = n * daily.map(d => d._3 * d._4).sum - t2 * ty
    val truth = Seq(0L, 1L, 10L).map { lam =>
      val a11 = s11 + lam * n * n; val a22 = s22 + lam * n * n
      val det = a11.toDouble * a22 - s12.toDouble * s12
      (lam, r((a22.toDouble * sy1 - s12.toDouble * sy2) / det, 9),
        r((a11.toDouble * sy2 - s12.toDouble * sy1) / det, 9))
    }.toSet
    val got = RidgeOps.q525RidgePath.fn(spark, sfDir).collect()
      .map(row => (row.getLong(0), row.getDouble(1), row.getDouble(2))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }

  test("q526: Chow F equals the literal three-fit replay") {
    def sse(rows: Seq[(Long, Long)]): Double = {
      val n = rows.length.toLong
      val tx = rows.map(_._1).sum; val ty = rows.map(_._2).sum
      val sxx = rows.map(p => p._1 * p._1).sum
      val sxy = rows.map(p => p._1 * p._2).sum
      val syy = rows.map(p => p._2 * p._2).sum
      val vxx = (n * sxx - tx * tx).toDouble
      val vxy = (n * sxy - tx * ty).toDouble
      val vyy = (n * syy - ty * ty).toDouble
      (vyy - vxy * vxy / vxx) / n.toDouble
    }
    val xy = daily.map(d => (d._1, (d._2, d._4)))
    val s1 = xy.filter(_._1 < "1995-07-01").map(_._2)
    val s2 = xy.filter(_._1 >= "1995-07-01").map(_._2)
    val sseP = sse(s1 ++ s2); val sse1 = sse(s1); val sse2 = sse(s2)
    val nAll = (s1.length + s2.length).toLong
    val f = ((sseP - sse1 - sse2) / 2) / ((sse1 + sse2) / (nAll - 4))
    val row = ChowOps.q526ChowTest.fn(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_all") == nAll)
    assert(row.getAs[Long]("n1") == s1.length.toLong)
    assert(row.getAs[Double]("chow_f") == r(f, 9))
  }

  test("q527: QLM top-10 equals the literal Dirichlet scorer") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(row => (row.getLong(0),
        "\\w+".r.findAllIn(row.getString(1)
          .toLowerCase(java.util.Locale.ROOT)).toSeq))
    val tot = docs.map(_._2.length).sum.toLong
    val terms = Seq("scan", "join", "window", "stream")
    val cf = terms.map(t =>
      t -> docs.map(_._2.count(_ == t).toLong).sum).toMap
    val truth = docs.map { case (id, ts) =>
      val dl = ts.length.toLong
      val score = terms.map { t =>
        val c = ts.count(_ == t).toLong
        math.floor(math.log((c * tot + 2000L * cf(t)).toDouble /
          ((dl + 2000L) * tot).toDouble) * 1e6).toLong
      }.sum
      (id, score)
    }.sortBy { case (id, sc) => (-sc, id) }.take(10)
    val got = QlmOps.q527QlmDirichlet.fn(spark, sfDir).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    assert(got.toSeq == truth.toSeq, s"got ${got.toSeq}\ntruth ${truth.toSeq}")
  }

  test("q528: Borda scores equal the literal positional count") {
    val rows = Tables(spark, sfDir).orders
      .selectExpr("EXTRACT(year FROM o_orderdate) AS yr", "o_custkey",
        "o_totalprice").collect()
      .map(row => (row.getInt(0), row.getLong(1), row.getDouble(2)))
    val nat = Tables(spark, sfDir).customer
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)").collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    val yearly = rows.groupBy(x => (x._1, nat(x._2))).view.mapValues(g =>
      g.map(x => math.floor(x._3 * 100 + 0.5).toLong).sum).toSeq
    val pts = yearly.groupBy(_._1._1).toSeq.flatMap { case (_, g) =>
      val m = g.length.toLong
      g.sortBy { case ((_, nation), cents) => (-cents, nation) }
        .zipWithIndex.map { case (((_, nation), _), i) =>
          (nation, m - (i + 1)) }
    }
    val scores = pts.groupBy(_._1).view.mapValues(g =>
      (g.map(_._2).sum, g.length.toLong)).toMap
    val truth = scores.toSeq
      .sortBy { case (nation, (sc, _)) => (-sc, nation) }.zipWithIndex
      .map { case ((nation, (sc, ny)), i) => (nation, sc, ny, i + 1L) }.toSet
    val got = RankAggOps.q528Borda.fn(spark, sfDir).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3))).toSet
    assert(got == truth, s"got $got\ntruth $truth")
  }
}
