package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the Kruskal–Wallis wave (q421): exact midrank
  * replay of H with tie correction, and the rank-conservation law.
  */
class KruskalOpsSpec extends SparkTestBase {

  test("q421: exact midrank replay and rank conservation") {
    val rows = KruskalOps.q421KruskalWallis.fn(spark, sfDir).collect()
    assert(rows.length == 5, "five order priorities")
    val n = rows.map(_.getAs[Long]("n_g")).sum
    // Σ n_g·meanrank = N(N+1)/2 (rank mass conservation, up to rounding)
    val mass = rows.map(r => r.getAs[Long]("n_g") * r.getAs[Double]("mean_rank")).sum
    assert(math.abs(mass - n.toDouble * (n + 1) / 2) < n * 1e-3)
    assert(rows.forall(_.getAs[Long]("df") == 4L))

    val vals = Tables(spark, sfDir).orders
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // 2x midranks
    val sorted = vals.map(_._2).sorted
    val firstRank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2).min + 1) }
    val cnt = vals.map(_._2).groupBy(identity).map { case (v, xs) => v -> xs.length }
    def r2(v: Double) = 2L * firstRank(v) + cnt(v) - 1
    val byG = vals.groupBy(_._1)
    val sr2 = byG.map { case (g, xs) => g -> xs.map(x => r2(x._2)).sum }
    val devSum = byG.map { case (g, xs) =>
      val d = sr2(g).toDouble - xs.length.toDouble * (n + 1)
      d * d / (4.0 * xs.length)
    }.sum
    val hRaw = BigDecimal(12.0 / (n.toDouble * (n + 1)) * devSum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tie3 = cnt.values.map(t => t.toLong * t * t - t).sum
    val tieC = 1.0 - tie3.toDouble / (n.toDouble * n * n - n)
    val h = BigDecimal(hRaw / tieC).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.head.getAs[Double]("h_raw") == hRaw)
    assert(rows.head.getAs[Double]("h") == h)
    rows.foreach { r =>
      val g = r.getAs[String]("grp")
      assert(r.getAs[Long]("n_g") == byG(g).length.toLong)
      val mr = BigDecimal(sr2(g).toDouble / 2.0 / byG(g).length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("mean_rank") == mr, s"mean rank of $g")
      assert(r.getAs[Boolean]("reject_5pct") == (h > 9.487729036781154))
    }
  }
}
