package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the Box–Cox wave (q419): the scaled-long
  * likelihood profile is replayed exactly in Scala, exactly one λ is
  * flagged best, and the flagged λ attains the max LL.
  */
class BoxCoxOpsSpec extends SparkTestBase {

  test("q419: exact scaled-long replay of the likelihood profile") {
    val rows = BoxCoxOps.q419BoxCox.fn(spark, sfDir).collect()
    assert(rows.length == 5)
    assert(rows.count(_.getAs[Boolean]("is_best")) == 1)
    val best = rows.filter(_.getAs[Boolean]("is_best")).head
    assert(rows.forall(_.getAs[Double]("ll") <= best.getAs[Double]("ll")))

    val xs = Tables(spark, sfDir).orders
      .select((col("o_totalprice") / 10000.0).as("x"))
      .collect().map(_.getDouble(0))
    val n = xs.length
    def z(l: Double, x: Double) = l match {
      case -1.0 => 1.0 - 1.0 / x
      case -0.5 => 2.0 * (1.0 - 1.0 / math.sqrt(x))
      case 0.0  => math.log(x)
      case 0.5  => 2.0 * (math.sqrt(x) - 1.0)
      case 1.0  => x - 1.0
    }
    val slny = xs.map(x => math.round(math.log(x) * 1e9)).sum
    rows.foreach { r =>
      val l = r.getAs[Double]("lambda")
      val sz = xs.map(x => math.round(z(l, x) * 1e9)).sum
      val szz = xs.map(x => math.round(z(l, x) * z(l, x) * 1e8)).sum
      val mz = sz.toDouble / 1e9 / n
      val s2 = szz.toDouble / 1e8 / n - mz * mz
      def rk(x: Double, k: Int) = BigDecimal(x).setScale(k,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("sigma2") == rk(s2, 6), s"sigma2 at $l")
      val ll = rk(-0.5 * n * math.log(math.max(s2, 1e-12)) +
        (l - 1.0) * slny.toDouble / 1e9, 4)
      assert(r.getAs[Double]("ll") == ll, s"ll at $l")
    }
  }
}
