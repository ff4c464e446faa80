package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the SAX wave (q433): exact PAA/symbol replay
  * from the daily census, segment-count and motif-census laws.
  */
class SaxOpsSpec extends SparkTestBase {

  test("q433: PAA replay, symbol discretization, motif census") {
    val rows = SaxOps.q433SaxMotifs.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("seg"))
    assert(rows.length <= 64 && rows.length >= 32, "segment frame")
    assert(rows.map(_.getAs[Long]("n_days")).sum ==
      Tables(spark, sfDir).orders.select(col("o_orderdate")).distinct().count())

    val daily = Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"))
      .agg(count(lit(1)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val t0 = daily.map(_._1).min; val t1 = daily.map(_._1).max
    val n = daily.length
    val mu = daily.map(_._2).sum.toDouble / n
    val sd = math.sqrt(daily.map(x => x._2.toDouble * x._2).sum / n - mu * mu)
    val bySeg = daily.groupBy { case (t, _) => (t - t0) * 64 / (t1 - t0 + 1) }
    val bp = 0.6744897501960817
    rows.foreach { row =>
      val seg = row.getAs[Long]("seg")
      val xs = bySeg(seg)
      assert(row.getAs[Long]("n_days") == xs.length.toLong)
      val paa = (xs.map(_._2).sum.toDouble / xs.length - mu) / sd
      assert(row.getAs[Double]("paa") ==
        BigDecimal(paa).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val sym = if (paa < -bp) "a" else if (paa < 0) "b"
        else if (paa < bp) "c" else "d"
      assert(row.getAs[String]("sym") == sym, s"symbol of segment $seg")
    }
    // motif law: trailing 2 segments carry no 3-motif; census consistent
    assert(rows.takeRight(2).forall(_.getAs[String]("motif3") == null))
    val motifs = rows.flatMap(r => Option(r.getAs[String]("motif3")))
    val census = motifs.groupBy(identity).view.mapValues(_.length)
    val best = census.toSeq.sortBy { case (m, c) => (-c, m) }.head
    assert(rows.head.getAs[String]("top_motif") == best._1)
    assert(rows.head.getAs[Long]("top_motif_n") == best._2.toLong)
    // the 3-motif at row i matches the symbols of segments i, i+1, i+2
    rows.sliding(3).foreach {
      case Array(a, b, c) =>
        assert(a.getAs[String]("motif3") ==
          a.getAs[String]("sym") + b.getAs[String]("sym") + c.getAs[String]("sym"))
      case _ =>
    }
  }
}
