package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the validation & release wave (q258–q261): CV
  * fold accounting, the DiD cell identity, MASE construction laws, and
  * the k-anonymity arithmetic.
  */
class ValidationOpsSpec extends SparkTestBase {

  test("CV: folds partition the orders, errors are positive and in a sane band") {
    val rows = ValidationOps.q258CvFolds.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("fold")).sorted.toSeq == (0L to 4L))
    val total = rows.map(_.getAs[Long]("n_held_out")).sum
    assert(total == Tables(spark, sfDir).orders.count())
    rows.foreach { r =>
      val mae = r.getAs[Double]("mae")
      val rmse = r.getAs[Double]("rmse")
      assert(mae > 0 && rmse >= mae, s"fold ${r.getAs[Long]("fold")}: mae $mae rmse $rmse")
    }
  }

  test("DiD: four cells, estimate equals the hand-computed cell combination") {
    val rows = ValidationOps.q259DiffInDiff.fn(spark, sfDir).collect()
    assert(rows.length == 4)
    val mu = rows.map(r => (r.getAs[String]("arm"), r.getAs[String]("era")) ->
      r.getAs[Double]("mean_value")).toMap
    assert(mu.keySet == Set(("treated", "post"), ("treated", "pre"),
      ("control", "post"), ("control", "pre")))
    val hand = (mu(("treated", "post")) - mu(("treated", "pre"))) -
      (mu(("control", "post")) - mu(("control", "pre")))
    val did = rows.head.getAs[Double]("did")
    assert(rows.forall(_.getAs[Double]("did") == did), "did differs across cells")
    assert(math.abs(did - hand) < 1e-4, s"did $did vs hand $hand")
    assert(rows.head.getAs[Double]("did_se") > 0)
  }

  test("MASE: ratio equals its parts, forecast days fewer than naive days") {
    val rows = ValidationOps.q260SeasonalNaiveMase.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mase = r.getAs[Double]("mase")
      val m7 = r.getAs[Double]("mae_seasonal")
      val m1 = r.getAs[Double]("mae_naive")
      assert(m7 > 0 && m1 > 0)
      assert(math.abs(mase - m7 / m1) < 1e-4)
    }
  }

  test("k-anonymity: class accounting adds up against an independent count") {
    val rows = ValidationOps.q261KanonymityAudit.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalRows = rows.map(_.getAs[Long]("n_rows")).sum
    assert(totalRows == Tables(spark, sfDir).orders.count(),
      "released rows do not cover the orders table")
    rows.foreach { r =>
      val below = r.getAs[Long]("rows_below_k")
      val n = r.getAs[Long]("n_rows")
      assert(below >= 0 && below <= n)
      assert(math.abs(r.getAs[Double]("share_below_k") - below.toDouble / n) < 1e-6)
      assert(r.getAs[Boolean]("k_anonymous") == (r.getAs[Long]("min_class_rows") >= 5))
    }
  }
}
