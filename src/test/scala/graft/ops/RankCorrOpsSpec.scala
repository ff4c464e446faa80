package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Semantic checks for the Spearman wave (q412): ρ is replayed in Scala
  * with tie-averaged ranks, bounds hold, and the revenue–price pair is
  * positively associated (revenue embeds price).
  */
class RankCorrOpsSpec extends SparkTestBase {

  private def spearman(xs: Seq[Double], ys: Seq[Double]): Double = {
    def avgRanks(v: Seq[Double]): Map[Int, Double] = {
      val idx = v.zipWithIndex.sortBy(_._1)
      val out = Array.ofDim[Double](v.length)
      var i = 0
      while (i < idx.length) {
        var j = i
        while (j < idx.length && idx(j)._1 == idx(i)._1) j += 1
        val r = (i + 1 + j) / 2.0 // average of ranks i+1 .. j
        (i until j).foreach(k => out(idx(k)._2) = r)
        i = j
      }
      out.zipWithIndex.map { case (r, k) => k -> r }.toMap
    }
    val ra = avgRanks(xs)
    val rb = avgRanks(ys)
    val n = xs.length.toDouble
    val a = (0 until xs.length).map(ra)
    val b = (0 until xs.length).map(rb)
    val sa = a.sum; val sb = b.sum
    val sab = a.zip(b).map { case (x, y) => x * y }.sum
    val saa = a.map(x => x * x).sum
    val sbb = b.map(x => x * x).sum
    (n * sab - sa * sb) /
      math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
  }

  test("q412: Scala tie-averaged replay matches; bounds hold") {
    val rows = RankCorrOps.q412SpearmanCorr.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("pair") ->
        (r.getAs[Long]("n"), r.getAs[Double]("rho"))).toMap
    assert(rows.keySet == Set("qty_price", "qty_size", "rev_price"))
    rows.values.foreach { case (n, rho) =>
      assert(n > 100 && rho >= -1.0 && rho <= 1.0)
    }
    val pp = Tables(spark, sfDir).lineitem
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("long")).cast("double").as("qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double").as("rev"))
      .join(Tables(spark, sfDir).part.select(col("p_partkey").as("pk"),
        col("p_retailprice").as("price"), col("p_size").cast("double").as("sz")),
        Seq("pk"))
      .collect()
    def check(pair: String, a: Array[Double], b: Array[Double]): Unit = {
      val expect = BigDecimal(spearman(a.toIndexedSeq, b.toIndexedSeq))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rows(pair)._2 - expect) < 2e-6, s"$pair replay")
    }
    check("qty_price", pp.map(_.getAs[Double]("qty")),
      pp.map(_.getAs[Double]("price")))
    check("qty_size", pp.map(_.getAs[Double]("qty")),
      pp.map(_.getAs[Double]("sz")))
    check("rev_price", pp.map(_.getAs[Double]("rev")),
      pp.map(_.getAs[Double]("price")))
  }
}
