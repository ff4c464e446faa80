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

  test("q405 primitives are bit-identical to the exploded join+agg forms they replace") {
    import graft.functions.VectorFunctions.{decimal_sqdist_skip, decimal_vec_wsum}
    import org.apache.spark.sql.types.DecimalType
    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .localCheckpoint()
    val pts = emb.select(col("vec_id"), col("label"),
      posexplode(col("v")).as(Seq("dim", "v")))

    // exploded mean seed vs decimal_vec_wsum(v, 1.0)
    val meanOld = pts.groupBy(col("label"), col("dim"))
      .agg(round(sum(round(col("v"), 9).cast(DecimalType(28, 9)))
        .cast("double") / count(lit(1)), 9).as("c"))
    val meanNew = emb.groupBy(col("label"))
      .agg(decimal_vec_wsum(col("v"), lit(1.0)).as("m"))
      .select(col("label"), posexplode(expr(
        "zip_with(m.sums, m.counts, (a, b) -> round(cast(a as double) / b, 9))"))
        .as(Seq("dim", "c2")))
    val meanBoth = meanOld.join(meanNew, Seq("label", "dim"), "full")
    assert(meanBoth.filter(col("c").isNull || col("c2").isNull ||
      col("c") =!= col("c2")).count() == 0, "mean seed diverged")

    // exploded distance + weighted re-center vs the fused round
    val centerArr = meanNew.groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, c2))), x -> x.c2)").as("cv"))
    val dOld = pts.join(meanOld, Seq("label", "dim"))
      .groupBy(col("label"), col("vec_id"))
      .agg(round(sqrt(sum(round((col("v") - col("c")) *
        (col("v") - col("c")), 12).cast(DecimalType(30, 12)))
        .cast("double")), 9).as("d"))
    val dNew = emb.join(broadcast(centerArr), Seq("label"))
      .select(col("label"), col("vec_id"), col("v"),
        round(sqrt(decimal_sqdist_skip(col("v"), col("cv"))), 9).as("d2"))
    val dBoth = dOld.join(dNew, Seq("label", "vec_id"), "full")
    assert(dBoth.filter(col("d").isNull || col("d2").isNull ||
      col("d") =!= col("d2")).count() == 0, "in-row distance diverged")

    val cOld = pts.join(dOld, Seq("label", "vec_id"))
      .groupBy(col("label"), col("dim"))
      .agg(round(sum(round(col("v") / greatest(col("d"), lit(1e-9)), 9)
          .cast(DecimalType(28, 9))).cast("double") /
        sum(round(lit(1.0) / greatest(col("d"), lit(1e-9)), 9)
          .cast(DecimalType(28, 9))).cast("double"), 9).as("c"))
    val cNew = dNew.groupBy(col("label"))
      .agg(decimal_vec_wsum(col("v"), greatest(col("d2"), lit(1e-9))).as("m"))
      .select(col("label"), posexplode(expr(
        "zip_with(m.sums, m.wsums, (a, b) -> round(cast(a as double) / cast(b as double), 9))"))
        .as(Seq("dim", "c2")))
    val cBoth = cOld.join(cNew, Seq("label", "dim"), "full")
    assert(cBoth.filter(col("c").isNull || col("c2").isNull ||
      col("c") =!= col("c2")).count() == 0, "weighted re-center diverged")
  }
}
