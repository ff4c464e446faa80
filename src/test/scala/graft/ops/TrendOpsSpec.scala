package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the trend & inference wave (q254–q257): a local
  * Theil-Sen replay, Mann-Kendall bounds and sign laws, the readability
  * formula's internal consistency, and the BH prefix property.
  */
class TrendOpsSpec extends SparkTestBase {

  test("Theil-Sen: matches a local pairwise-median replay per nation") {
    val out = TrendOps.q254TheilSen.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("sen_slope"))).toMap
    assert(out.nonEmpty)
    val t = Tables(spark, sfDir)
    val daily = t.lineitem
      .join(t.orders.filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01")), col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
      .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(22, 8))).cast("double"), 9).as("rev"))
      .select(col("n_name"), datediff(col("day"), lit("1992-01-01")).as("d"), col("rev"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getDouble(2)))
    daily.groupBy(_._1).foreach { case (nation, days) =>
      val pts = days.map(x => (x._2, x._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- i + 1 until pts.length
      } yield {
        val s = (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)
        math.rint(s * 1e9) / 1e9
      }).sorted
      val n = slopes.length
      val med = (slopes((n + 1) / 2 - 1) + slopes(n / 2)) / 2
      val (np, slope) = out(nation)
      assert(np == n, s"$nation: $np pairs vs local $n")
      assert(math.abs(slope - med) < 1e-5, s"$nation: $slope vs local median $med")
    }
  }

  test("Mann-Kendall: S bounded by the pair count, z sign follows S, labels consistent") {
    val rows = TrendOps.q255MannKendall.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days")
      val s = r.getAs[Long]("s_stat")
      val z = r.getAs[Double]("z")
      assert(math.abs(s) <= n * (n - 1) / 2, s"${r.getAs[String]("n_name")}: |S|=$s for n=$n")
      assert(r.getAs[Double]("var_s") > 0)
      assert(s.sign == 0 || z.sign == s.sign.toDouble || z == 0.0)
      val trend = r.getAs[String]("trend")
      if (z > 1.96) assert(trend == "increasing")
      else if (z < -1.96) assert(trend == "decreasing")
      else assert(trend == "none")
    }
  }

  test("readability: counts coherent, flesch equals its formula") {
    val rows = TrendOps.q256Readability.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sents = r.getAs[Long]("n_sents")
      val words = r.getAs[Long]("n_words")
      val syll = r.getAs[Long]("n_syll")
      assert(sents >= 1 && words >= 1)
      assert(syll >= words, "a word contributes at least one syllable")
      val expect = 206.835 - 1.015 * words.toDouble / sents - 84.6 * syll.toDouble / words
      assert(math.abs(r.getAs[Double]("flesch") - expect) < 1e-4)
    }
  }

  test("BH: k is a permutation, p sorted along k, rejections form the BH prefix") {
    val rows = TrendOps.q257BhFdr.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("p"),
                 r.getAs[Double]("bh_cut"), r.getAs[Boolean]("rejected")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    assert(rows.sliding(2).forall(w => w(0)._2 <= w(1)._2), "p not sorted along k")
    val passing = rows.filter(r => r._2 <= r._3).map(_._1)
    val kMax = if (passing.nonEmpty) passing.max else 0L
    rows.foreach { case (k, _, _, rej) =>
      assert(rej == (k <= kMax), s"k=$k rejected=$rej but kMax=$kMax")
    }
  }
}
