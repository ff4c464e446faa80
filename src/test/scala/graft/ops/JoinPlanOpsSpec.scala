package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for wave q458–q459: an INDEPENDENT memoized-recursion
  * Selinger DP over the same stats (top-down vs the engine's bottom-up —
  * agreement proves the lattice search), plus optimal-substructure laws;
  * and an Ansari–Bradley moments replay with the score-symmetry law.
  */
class JoinPlanOpsSpec extends SparkTestBase {

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q458: top-down memoized DP agrees with the bottom-up engine") {
    val rows = JoinPlanOps.q458SelingerDp.fn(spark, sfDir).collect()
    assert(rows.length == 15, "connected subsets of a 5-chain = intervals")
    val t = Tables(spark, sfDir)
    val n = Seq(t.region.count(), t.nation.count(), t.customer.count(),
      t.orders.count(), t.lineitem.count())
    val nd = Seq(
      math.max(t.region.select(countDistinct(col("r_regionkey"))).head.getLong(0),
        t.nation.select(countDistinct(col("n_regionkey"))).head.getLong(0)),
      math.max(t.nation.select(countDistinct(col("n_nationkey"))).head.getLong(0),
        t.customer.select(countDistinct(col("c_nationkey"))).head.getLong(0)),
      math.max(t.customer.select(countDistinct(col("c_custkey"))).head.getLong(0),
        t.orders.select(countDistinct(col("o_custkey"))).head.getLong(0)),
      math.max(t.orders.select(countDistinct(col("o_orderkey"))).head.getLong(0),
        t.lineitem.select(countDistinct(col("l_orderkey"))).head.getLong(0)))
    def connected(m: Int): Boolean = { val x = m / (m & -m); (x & (x + 1)) == 0 }
    def estRows(m: Int): Double = {
      var ln = BigDecimal(0)
      (0 to 4).foreach { i => if ((m >> i & 1) == 1)
        ln += BigDecimal(r(math.log(n(i).toDouble), 9)) }
      (0 to 3).foreach { e => if ((m >> e & 1) == 1 && (m >> (e + 1) & 1) == 1)
        ln += BigDecimal(r(-math.log(nd(e).toDouble), 9)) }
      r(math.exp(ln.toDouble), 4)
    }
    val memo = collection.mutable.Map[Int, (Double, Int)]()
    def dp(m: Int): (Double, Int) = memo.getOrElseUpdate(m, {
      if (Integer.bitCount(m) == 1) (0.0, 0)
      else {
        val cands = for {
          m1 <- 1 until 32 if (m1 & m) == m1 && m1 != m && m1 != 0
          m2 = m ^ m1 if m1 < m2 && connected(m1) && connected(m2)
        } yield (r(dp(m1)._1 + dp(m2)._1 + estRows(m), 4), m1)
        cands.minBy(identity)
      }
    })
    rows.foreach { row =>
      val m = row.getAs[Long]("mask").toInt
      assert(connected(m))
      assert(row.getAs[Double]("est_rows") == r(estRows(m), 2), s"rows $m")
      val (c, split) = dp(m)
      assert(row.getAs[Double]("best_cost") == r(c, 2), s"cost $m")
      assert(row.getAs[Long]("best_split") == split.toLong, s"split $m")
    }
    // optimal substructure: the full plan beats the left-deep chain
    val full = rows.find(_.getAs[Long]("mask") == 31L).get
    var leftDeep = 0.0
    var acc = 1
    (1 to 4).foreach { i => acc |= 1 << i; leftDeep = r(leftDeep + estRows(acc), 4) }
    assert(full.getAs[Double]("best_cost") <= r(leftDeep, 2) + 1e-9,
      "DP no worse than the left-deep chain")
  }

  test("q459: linear-rank moments replay and scale-score law") {
    val row = JoinPlanOps.q459AnsariBradley.fn(spark, sfDir).head()
    val o = Tables(spark, sfDir).orders
      .select(col("o_orderpriority") === "1-URGENT",
        col("o_totalprice").cast("decimal(18,2)")).collect()
      .map(x => (x.getBoolean(0), BigDecimal(x.getDecimal(1))))
    val nn = o.length
    assert(row.getAs[Long]("n_orders") == nn.toLong)
    // 2*midrank scores via sorting
    val sorted = o.map(_._2).sorted
    val firstRank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2).min + 1) }
    val cnt = o.map(_._2).groupBy(identity).map { case (v, xs) => v -> xs.length }
    def s2(v: BigDecimal): Long = {
      val r2 = 2L * firstRank(v) + cnt(v) - 1
      math.min(r2, 2L * (nn + 1) - r2)
    }
    val ab2 = o.filter(_._1).map(x => s2(x._2)).sum
    assert(row.getAs[Double]("ab_stat") == ab2 / 2.0)
    val all2 = o.map(x => s2(x._2))
    val sbar2 = all2.sum.toDouble / nn
    val m1 = o.count(_._1)
    val e2 = m1 * sbar2
    val v4 = m1.toDouble * (nn - m1) / (nn.toDouble * (nn - 1)) *
      (all2.map(x => x.toDouble * x).sum - nn * sbar2 * sbar2)
    assert(row.getAs[Double]("e_ab") == r(e2 / 2, 4))
    assert(row.getAs[Double]("var_ab") == r(v4 / 4, 4))
    assert(row.getAs[Double]("z") == r((ab2 - e2) / math.sqrt(v4), 6))
    // score law: every 2-score within [2, N+1]
    assert(all2.forall(x => x >= 2 && x <= nn + 1))
  }
}
