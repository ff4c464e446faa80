package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the allocation & selection wave (q376–q377):
  * UCB1's index/regret identities, and the mRMR greedy against an
  * independent reimplementation over brute-forced MIs.
  */
class SelectOpsSpec extends SparkTestBase {

  test("q376: UCB dominates the mean, best arm has zero gap, regret identity holds") {
    val rows = SelectOps.q376UcbAllocation.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val best = rows.map(_.getAs[Double]("mean_reward")).max
    var zeroGaps = 0
    rows.foreach { r =>
      assert(r.getAs[Double]("ucb_index") > r.getAs[Double]("mean_reward"),
        "exploration bonus must be positive")
      val gap = r.getAs[Double]("gap")
      assert(gap >= 0.0)
      if (gap == 0.0) {
        zeroGaps += 1
        assert(r.isNullAt(r.fieldIndex("ucb_pull_bound")), "best arm has no pull bound")
        assert(r.getAs[Double]("realized_regret") == 0.0)
      } else {
        assert(math.abs(r.getAs[Double]("realized_regret") -
          math.rint(r.getAs[Long]("n_pulls") * gap * 100) / 100) < 0.02)
        assert(r.getAs[Double]("ucb_pull_bound") > 0.0)
      }
      assert(math.abs(best - r.getAs[Double]("mean_reward") - gap) < 2e-6)
    }
    assert(zeroGaps >= 1, "some arm must be the empirical best")
  }

  test("q377: greedy selection matches an independent mRMR over brute-forced MIs") {
    val rows = SelectOps.q377MrmrFeatures.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 4)
    // brute-force every MI from collected binary columns
    val data = Tables(spark, sfDir).orders.select(
        (col("o_totalprice") > 150000.0).cast("int"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int"),
        (month(col("o_orderdate")) <= 6).cast("int"),
        (pmod(col("o_custkey"), lit(2)) === 0).cast("int"),
        (dayofmonth(col("o_orderdate")) <= 15).cast("int"),
        (pmod(col("o_orderkey"), lit(3)) === 0).cast("int"),
        (col("o_orderstatus") === "F").cast("int"))
      .collect().map(r => Array.tabulate(7)(r.getInt))
    val names = Seq("f_price", "f_urgent", "f_h1", "f_even", "f_early", "f_mod3", "y")
    val n = data.length.toDouble
    def mi(i: Int, j: Int): Double = {
      val cells = data.groupBy(r => (r(i), r(j))).view.mapValues(_.length.toDouble)
      val pa = data.groupBy(_(i)).view.mapValues(_.length.toDouble).toMap
      val pb = data.groupBy(_(j)).view.mapValues(_.length.toDouble).toMap
      val raw = cells.map { case ((a, b), nab) =>
        BigDecimal(nab / n * math.log(nab * n / (pa(a) * pb(b))))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      raw.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val miMap = (for (i <- 0 until 7; j <- 0 until 7 if i < j) yield {
      val Seq(a, b) = Seq(names(i), names(j)).sorted
      (a, b) -> mi(i, j)
    }).toMap
    def m(a: String, b: String) = if (a < b) miMap((a, b)) else miMap((b, a))
    val sel = scala.collection.mutable.ArrayBuffer.empty[String]
    val expected = (1 to 4).map { _ =>
      val pick = names.init.filterNot(sel.contains).maxBy { f =>
        val red = if (sel.isEmpty) 0.0
          else BigDecimal(sel.map(s => m(f, s)).sum / sel.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (BigDecimal(m(f, "y") - red).setScale(6, BigDecimal.RoundingMode.HALF_UP), f)
      }(Ordering.Tuple2(Ordering[BigDecimal], Ordering[String].reverse))
      sel += pick
      pick
    }
    assert(rows.map(_.getAs[String]("feature")).toSeq == expected,
      s"selection order ${rows.map(_.getAs[String]("feature")).mkString(",")} != $expected")
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("mrmr_score") -
        (BigDecimal(r.getAs[Double]("relevance") - r.getAs[Double]("redundancy"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)) < 2e-6)
      assert(r.getAs[Double]("relevance") >= 0.0)
    }
    // rank-1 pick is the max-relevance feature with zero redundancy
    assert(rows.head.getAs[Double]("redundancy") == 0.0)
  }
}
