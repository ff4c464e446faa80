package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the seeding & uncertainty wave (q342–q344):
  * Gonzalez invariants against brute force, bootstrap-CI sanity, and
  * InfoNCE loss bounds.
  */
class SeedOpsSpec extends SparkTestBase {

  test("q342: farthest-first trace matches brute force and radii are non-increasing") {
    val rows = SeedOps.q342KcenterSeeding.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("seed_id")).distinct.length == 6, "duplicate seeds")
    // selection radii are non-increasing after round 1 (farthest-first law)
    val radii = rows.drop(1).map(_.getAs[Double]("sel_radius"))
    radii.zip(radii.tail).foreach { case (a, b) => assert(a >= b, s"radius rose: $a -> $b") }
    assert(rows.map(_.getAs[Long]("n_assigned")).sum ==
      Tables(spark, sfDir).embeddings.count())
    // brute-force the trajectory
    val vecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    var chosen = Vector(0L)
    for (_ <- 1 to 5) {
      val next = vecs.filterNot(v => chosen.contains(v._1))
        .map { case (id, v) => (id, chosen.map(c => d2(vecs.find(_._1 == c).get._2, v)).min) }
        .maxBy { case (id, dm) => (dm, -id) }
      chosen = chosen :+ next._1
    }
    assert(rows.map(_.getAs[Long]("seed_id")).toVector == chosen,
      s"trajectory ${rows.map(_.getAs[Long]("seed_id")).toVector} vs brute $chosen")
  }

  test("q343: point estimate inside the CI, SE positive, replicate count sane") {
    val r = SeedOps.q343PoissonBootstrap.fn(spark, "/root/testdata/sf0.01").collect().head
    val point = r.getAs[Double]("point_mean")
    val lo = r.getAs[Double]("ci_lo"); val hi = r.getAs[Double]("ci_hi")
    assert(r.getAs[Long]("n_reps") == 50L)
    assert(lo < hi && lo <= point && point <= hi,
      s"point $point outside bootstrap CI [$lo, $hi]")
    assert(r.getAs[Double]("boot_se") > 0)
    // the CI is tight relative to the mean at n≈600 docs (SE ~ σ/√n)
    assert((hi - lo) / point < 0.5, "CI implausibly wide")
  }

  test("q344: losses bounded by ln(n_cands) for a well-separated positive and positive shares the label") {
    val rows = SeedOps.q344InfonceAudit.fn(spark, sfDir).collect()
    assert(rows.length == 8)
    val labels = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val a = r.getAs[Long]("anchor_id")
      assert(r.getAs[Long]("n_cands") == 63L)
      assert(labels(r.getAs[Long]("pos_id")) == labels(a), "positive label mismatch")
      val loss = r.getAs[Double]("infonce_loss")
      // -ln(softmax) over 63 candidates is in (0, ln 63 + 20/τ-margin); a
      // perfect positive gives ~0, uniform gives ln(63) ≈ 4.14; with
      // τ=0.1 a dominated positive can exceed that, but not the hard
      // bound -ln(e_min/denom) where spread ≤ e^(2/τ)
      assert(loss > 0.0 && loss < 2.0 / 0.1 + math.log(63.0),
        s"anchor $a loss $loss out of bounds")
    }
  }
}
