package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for wave q466–q467: a sequential record-walk replay
  * per nation (plus Rényi's E[records] ≈ ln n sanity band), and a
  * burstiness moments replay with the B ∈ (-1, 1) and sign-vs-CV laws.
  */
class RecordsOpsSpec extends SparkTestBase {

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def ordersByNation() = Tables(spark, sfDir).orders
    .join(Tables(spark, sfDir).customer
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("nk")),
      Seq("o_custkey"))
    .select(col("nk"), col("o_custkey"),
      datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"),
      col("o_orderkey"), col("o_totalprice").cast("decimal(18,2)"))
    .collect()
    .map(x => (x.getAs[Number]("nk").longValue, x.getLong(1), x.getLong(2),
      x.getLong(3), BigDecimal(x.getDecimal(4))))

  test("q466: sequential record-walk replay; Renyi band") {
    val rows = RecordsOps.q466RecordCensus.fn(spark, sfDir).collect()
    assert(rows.length == 25)
    val byNk = ordersByNation().groupBy(_._1)
    rows.foreach { row =>
      val nk = row.getAs[Long]("nation")
      val seq = byNk(nk).sortBy(x => (x._3, x._4))
      var best = Option.empty[BigDecimal]
      var recs = 0L
      seq.foreach { x =>
        if (best.forall(x._5 > _)) { recs += 1; best = Some(x._5) }
      }
      assert(row.getAs[Long]("n_orders") == seq.length.toLong)
      assert(row.getAs[Long]("n_records") == recs, s"nation $nk")
      // harmonic replay
      val h1 = (1 to seq.length).map(k =>
        BigDecimal(r(1.0 / k, 12))).sum.toDouble
      assert(row.getAs[Double]("e_records") == r(h1, 4))
      // Renyi: E ~ ln n + gamma
      val approx = math.log(seq.length.toDouble) + 0.5772156649
      // H_n - ln n - gamma ~ 1/(2n)
      assert(math.abs(h1 - approx) < 1.0 / (2.0 * seq.length) + 1e-3,
        "harmonic ~ ln n + gamma + 1/(2n)")
    }
  }

  test("q467: burstiness moments replay; range and sign laws") {
    val rows = RecordsOps.q467Burstiness.fn(spark, sfDir).collect()
    assert(rows.length == 25)
    val gapsByNk = ordersByNation().groupBy(x => (x._1, x._2)).toSeq
      .flatMap { case ((nk, _), xs) =>
        val ds = xs.sortBy(x => (x._3, x._4)).map(_._3)
        ds.zip(ds.tail).map { case (a, b) => nk -> (b - a) }
      }.groupBy(_._1)
    rows.foreach { row =>
      val nk = row.getAs[Long]("nation")
      val gaps = gapsByNk(nk).map(_._2)
      assert(row.getAs[Long]("n_gaps") == gaps.length.toLong)
      val mu = gaps.sum.toDouble / gaps.length
      val sd = math.sqrt(gaps.map(g => g.toDouble * g).sum / gaps.length
        - mu * mu)
      assert(row.getAs[Double]("mean_gap") == r(mu, 4))
      assert(row.getAs[Double]("burstiness") == r((sd - mu) / (sd + mu), 6),
        s"nation $nk")
      val b = row.getAs[Double]("burstiness")
      assert(b > -1 && b < 1, "B in (-1, 1)")
      assert((b > 0) == (row.getAs[Double]("cv") > 1), "B sign == CV > 1")
    }
  }
}
