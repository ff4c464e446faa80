package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Semantic checks for the Pettitt wave (q422): the integer prefix-U
  * series is replayed exactly (including the U ≡ Mann–Whitney identity)
  * and the argmax/K/p/means all follow.
  */
class PettittOpsSpec extends SparkTestBase {

  test("q422: exact integer U replay and the Mann-Whitney identity") {
    val r = PettittOps.q422PettittChangepoint.fn(spark, sfDir).head()

    val daily = Tables(spark, sfDir).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast("double").as("y"))
      .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
    val tt = daily.length
    val sortedV = daily.map(_._2).sorted
    val firstRank = sortedV.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2).min + 1) }
    val cnt = daily.map(_._2).groupBy(identity).map { case (v, xs) => v -> xs.length }
    def r2(v: Double) = 2L * firstRank(v) + cnt(v) - 1
    var acc = 0L
    val us = daily.zipWithIndex.map { case ((t, y), i) =>
      acc += r2(y)
      (t, acc - (i + 1).toLong * (tt + 1))
    }
    // identity check at a few prefixes: U_t = #{i<=t,j>t: y_i>y_j} - #{<}
    Seq(tt / 4, tt / 2, 3 * tt / 4).foreach { k =>
      val (pre, post) = daily.splitAt(k)
      val gt = pre.map(p => post.count(q => p._2 > q._2).toLong).sum
      val lt = pre.map(p => post.count(q => p._2 < q._2).toLong).sum
      assert(us(k - 1)._2 == gt - lt, s"U identity at prefix $k")
    }
    val best = us.dropRight(1).maxBy(u => (math.abs(u._2), -u._1))
    assert(r.getAs[Long]("t_star") == best._1)
    assert(r.getAs[Long]("k_stat") == math.abs(best._2))
    assert(r.getAs[Long]("direction") == math.signum(best._2))
    assert(r.getAs[Long]("n_days") == tt.toLong)
    val p = BigDecimal(2.0 * math.exp(-6.0 * math.pow(math.abs(best._2), 2) /
      (tt.toDouble * tt * tt + tt.toDouble * tt))).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("p_approx") == p)
    assert(r.getAs[Double]("mean_pre") > 0 && r.getAs[Double]("mean_post") > 0)
  }
}
