package graft.ops

import graft.SparkTestBase

/** Semantic laws for the journey & coverage wave (q314–q317):
  * conditioning reduces entropy, node removal cannot raise conversion,
  * Shapley efficiency, and JS non-negativity.
  */
class JourneyOpsSpec extends SparkTestBase {

  test("char entropy: conditioning reduces entropy, counts consistent") {
    val rows = JourneyOps.q314CharEntropy.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (hc, ht) = (r.getAs[Double]("h_cond_bits"), r.getAs[Double]("h_tri_bits"))
      assert(hc >= 0 && ht >= 0)
      assert(hc <= ht + 1e-9,
        s"${r.getAs[String]("lang")}: H(c3|c1c2)=$hc above H(tri)=$ht")
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_trigrams"))
    }
  }

  test("markov removal: deleting a node never raises conversion, effects bounded") {
    val rows = JourneyOps.q315MarkovRemoval.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("removed") ->
        (r.getAs[Double]("conv"), r.getAs[Double]("removal_effect")))
      .toMap
    assert(rows.keySet == Set("base", "view", "click", "signup", "error"))
    val base = rows("base")._1
    assert(base > 0 && base <= 1)
    rows.foreach { case (ch, (conv, re)) =>
      assert(conv >= -1e-9 && conv <= base + 1e-6,
        s"removing $ch raised conversion: $conv vs base $base")
      if (ch != "base") assert(re >= -1e-6 && re <= 1.0 + 1e-9)
      else assert(re == 0.0)
    }
  }

  test("shapley: efficiency axiom holds over the mask lattice") {
    import org.apache.spark.sql.functions._
    val rows = JourneyOps.q316ShapleyAttribution.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("channel")).toSet ==
      Set("view", "click", "signup", "error"))
    // recompute v(full) and v(empty) from the same journey definition
    val wUser = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val masks = EventOps.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("pb", sum((col("event_type") === "purchase").cast("long"))
        .over(wUser.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)))
      .filter(coalesce(col("pb"), lit(0L)) === 0L)
      .groupBy(col("user_id"))
      .agg((max((col("event_type") === "view").cast("long")) +
        max((col("event_type") === "click").cast("long")) * 2 +
        max((col("event_type") === "signup").cast("long")) * 4 +
        max((col("event_type") === "error").cast("long")) * 8).as("mask"),
        max((col("event_type") === "purchase").cast("long")).as("conv"))
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c")).collect()
      .map(r => r.getAs[Long]("mask") ->
        (math.rint(r.getAs[Long]("c").toDouble / r.getAs[Long]("n") * 1e9) / 1e9))
      .toMap
    val vFull = masks.getOrElse(15L, 0.0)
    val vEmpty = masks.getOrElse(0L, 0.0)
    val total = rows.map(_.getAs[Double]("shapley")).sum
    assert(math.abs(total - (vFull - vEmpty)) < 1e-4,
      s"efficiency violated: sum phi=$total vs v(full)-v(empty)=${vFull - vEmpty}")
  }

  test("embedding coverage: shares normalize, JS non-negative and totals its cells") {
    val rows = JourneyOps.q317EmbeddingCoverage.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val js = rows.map(_.getAs[Double]("js")).distinct
    assert(js.size == 1 && js.head >= 0 && js.head <= 1.0 + 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("p_train")).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_.getAs[Double]("p_eval")).sum - 1.0) < 1e-3)
    rows.foreach { r =>
      assert(r.getAs[Double]("js_contrib") >= -1e-9,
        "pointwise JS contribution negative")
    }
    assert(math.abs(rows.map(_.getAs[Double]("js_contrib")).sum - js.head) < 1e-4)
  }
}
