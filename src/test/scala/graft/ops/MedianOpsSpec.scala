package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the geometric-median wave (q405): Weiszfeld's
  * descent property (Σ distances never increases from the mean seed)
  * and a full 4-round replay per label.
  */
class MedianOpsSpec extends SparkTestBase {

  test("q405: Weiszfeld descends and matches a replay") {
    val rows = MedianOps.q405GeometricMedian.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("improvement") >= -1e-4,
        s"label ${r.get(0)}: Weiszfeld must not increase the objective")
      assert(r.getAs[Double]("sum_dist_median") > 0)
      assert(r.getAs[Double]("center_shift") >= 0)
    }

    val emb = Tables(spark, sfDir).embeddings
      .select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def r9(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    emb.groupBy(_._1).foreach { case (label, vs0) =>
      val vs = vs0.map(_._2)
      val dims = vs.head.length
      var c = Array.tabulate(dims) { d =>
        r9(vs.map(v => BigDecimal(r9(v(d)))).sum.toDouble / vs.length)
      }
      def dist(v: Array[Double], c: Array[Double]): Double =
        r9(math.sqrt(v.indices.map(d =>
          BigDecimal((v(d) - c(d)) * (v(d) - c(d))).setScale(12,
            BigDecimal.RoundingMode.HALF_UP)).sum.toDouble))
      val meanC = c
      for (_ <- 1 to 4) {
        val ds = vs.map(v => math.max(dist(v, c), 1e-9))
        c = Array.tabulate(dims) { d =>
          val num = vs.zip(ds).map { case (v, dd) =>
            BigDecimal(r9(v(d) / dd)) }.sum.toDouble
          val den = ds.map(dd => BigDecimal(r9(1.0 / dd))).sum.toDouble
          r9(num / den)
        }
      }
      val sdMean = vs.map(v => BigDecimal(dist(v, meanC))).sum.toDouble
      val sdMed = vs.map(v => BigDecimal(dist(v, c))).sum.toDouble
      val got = rows.find(_.getAs[Int]("label") == label).get
      assert(math.abs(got.getAs[Double]("sum_dist_mean") - sdMean) < 1e-2,
        s"label $label sum_dist_mean")
      assert(math.abs(got.getAs[Double]("sum_dist_median") - sdMed) < 1e-2,
        s"label $label sum_dist_median")
    }
  }
}
