package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the Cronbach wave (q420): exact scaled-long
  * replay of the moment algebra plus the α bounds/diagnostic laws.
  */
class ReliabilityOpsSpec extends SparkTestBase {

  test("q420: scaled-long replay, alpha bounds, item diagnostics") {
    val rows = ReliabilityOps.q420CronbachAlpha.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("item")).toSet == Set("x1", "x2", "x3"))
    val alpha = rows.head.getAs[Double]("alpha")
    assert(rows.forall(_.getAs[Double]("alpha") == alpha))
    assert(alpha <= 1.0, "Cronbach alpha never exceeds 1")
    rows.foreach { r =>
      assert(r.getAs[Double]("var_item") > 0)
      val c = r.getAs[Double]("item_total_corr")
      assert(c >= -1.0 && c <= 1.0)
    }

    val feats = Tables(spark, sfDir).documents
      .select(TextOps.tokens(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .select(
        (least(size(col("toks")), lit(200)).cast("double") / 200.0).as("x1"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks"))).as("x2"),
        (least(expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)")
          .cast("double") / size(col("toks")), lit(8.0)) / 8.0).as("x3"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val n = feats.length
    def sl(f: ((Double, Double, Double)) => Double) =
      feats.map(t => math.round(f(t) * 1e10)).sum
    def mv(s: Long, ss: Long) = {
      val m = s.toDouble / 1e10 / n
      ss.toDouble / 1e10 / n - m * m
    }
    val (v1, v2, v3) = (mv(sl(_._1), sl(t => t._1 * t._1)),
      mv(sl(_._2), sl(t => t._2 * t._2)), mv(sl(_._3), sl(t => t._3 * t._3)))
    def cvv(sa: Long, sb: Long, sp: Long) =
      sp.toDouble / 1e10 / n -
        (sa.toDouble / 1e10 / n) * (sb.toDouble / 1e10 / n)
    val c12 = cvv(sl(_._1), sl(_._2), sl(t => t._1 * t._2))
    val c13 = cvv(sl(_._1), sl(_._3), sl(t => t._1 * t._3))
    val c23 = cvv(sl(_._2), sl(_._3), sl(t => t._2 * t._3))
    val vt = v1 + v2 + v3 + 2.0 * (c12 + c13 + c23)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(alpha == r6(1.5 * (1.0 - (v1 + v2 + v3) / vt)))
    val byItem = rows.map(r => r.getAs[String]("item") -> r).toMap
    assert(byItem("x1").getAs[Double]("item_total_corr") ==
      r6((v1 + c12 + c13) / math.sqrt(v1 * vt)))
    assert(byItem("x2").getAs[Double]("item_total_corr") ==
      r6((c12 + v2 + c23) / math.sqrt(v2 * vt)))
  }
}
