package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the causal-design wave (q383–q384): the
  * subclassification weighting laws + brute-forced strata, and the
  * power formula's monotonicity + closed-form recomputation.
  */
class DesignOpsSpec extends SparkTestBase {

  test("q383: ATE/ATT are convex combinations of stratum effects; strata brute-force") {
    val rows = DesignOps.q383PsStratification.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val effs = rows.map(_.getAs[Double]("stratum_effect"))
    val ate = rows.head.getAs[Double]("ate")
    val att = rows.head.getAs[Double]("att")
    // weighted averages stay inside the stratum-effect envelope
    assert(ate >= effs.min - 1e-6 && ate <= effs.max + 1e-6)
    assert(att >= effs.min - 1e-6 && att <= effs.max + 1e-6)
    // recompute ATE/ATT from the published per-stratum rows
    val wate = rows.map(r => r.getAs[Double]("stratum_effect") * r.getAs[Long]("n_s")).sum /
      rows.map(_.getAs[Long]("n_s")).sum
    val watt = rows.map(r => r.getAs[Double]("stratum_effect") * r.getAs[Long]("n1")).sum /
      rows.map(_.getAs[Long]("n1")).sum
    assert(math.abs(ate - wate) < 1e-4)
    assert(math.abs(att - watt) < 1e-4)
    // one stratum brute-forced from raw tables
    val head = rows.head
    val seg = head.getAs[String]("segment"); val yr = head.getAs[Int]("o_year")
    val t = Tables(spark, sfDir)
    val cell = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === seg && year(col("o_orderdate")) === yr)
      .select(col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int"),
        col("o_totalprice"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    val y1 = cell.filter(_._1 == 1).map(_._2)
    val y0 = cell.filter(_._1 == 0).map(_._2)
    assert(head.getAs[Long]("n1") == y1.length.toLong)
    assert(head.getAs[Long]("n0") == y0.length.toLong)
    assert(math.abs(head.getAs[Double]("y1_mean") - y1.sum / y1.length) < 1e-2)
    rows.foreach(r => assert(r.getAs[Long]("n_s") ==
      r.getAs[Long]("n1") + r.getAs[Long]("n0")))
  }

  test("q384: sample size falls with effect size and recomputes from the closed form") {
    val rows = DesignOps.q384PowerPlanner.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("lift_pct"))
    assert(rows.length == 10)
    val ns = rows.map(_.getAs[Long]("n_per_arm"))
    assert(ns.sliding(2).forall(p => p.length < 2 || p(0) > p(1)),
      "larger lifts must need fewer samples")
    val p0 = rows.head.getAs[Double]("p0")
    assert(p0 > 0.0 && p0 < 1.0)
    rows.foreach { r =>
      val lift = r.getAs[Int]("lift_pct")
      val p1 = p0 * (1.0 + lift / 100.0)
      assert(math.abs(r.getAs[Double]("p1") - math.rint(p1 * 1e6) / 1e6) < 2e-6)
      val n = math.ceil(7.848886 * (p0 * (1 - p0) + p1 * (1 - p1)) /
        ((p1 - p0) * (p1 - p0)))
      // published n recomputes within the rounding the query applies
      assert(math.abs(r.getAs[Long]("n_per_arm") - n) <= 1.0,
        s"lift $lift: n ${r.getAs[Long]("n_per_arm")} != $n")
      assert(r.getAs[Long]("days_needed") >= 1)
    }
  }
}
