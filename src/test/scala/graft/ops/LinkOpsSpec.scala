package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the link-prediction & release wave (q262–q265):
  * predicted links are non-edges with real common neighbors, Katz
  * dominance laws on the tree, the DP noise/utility identities, and
  * exact largest-remainder budget accounting.
  */
class LinkOpsSpec extends SparkTestBase {

  test("link prediction: predictions are open wedges — never existing edges, cn ≥ 1") {
    val rows = LinkOps.q262LinkPrediction.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Long]("rk"), r.getAs[Long]("predicted"),
                 r.getAs[Long]("cn"), r.getAs[Double]("jaccard"), r.getAs[Double]("adamic_adar")))
    assert(rows.nonEmpty)
    rows.foreach { case (a, rk, b, cn, jac, aa) =>
      assert(rk >= 1 && rk <= 3)
      assert(cn >= 1, s"($a,$b): predicted with zero common neighbors")
      assert(jac > 0 && jac <= 1.0)
      assert(aa > 0)
    }
    // rebuild the edge set and assert no prediction is an existing edge
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    rows.foreach { case (a, _, b, _, _, _) =>
      assert(!edges((a min b, a max b)), s"($a,$b) predicted but already an edge")
    }
  }

  test("Katz: scores ≥ 1, bounded by the degree-3 geometric limit, root beats a leaf") {
    val rows = LinkOps.q263KatzCentrality.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Double]("katz")).toMap
    val n = Tables(spark, sfDir).part.count()
    assert(rows.size == n)
    // β·deg ≤ 0.3 per hop ⇒ x ≤ 1/(1 − 0.3) within 3 iterations
    rows.values.foreach { x => assert(x >= 1.0 && x < 1.0 / 0.7 + 1e-6) }
    val maxKey = rows.keys.max
    val leaf = rows.keys.filter(k => k * 2 > maxKey && k >= 2).head
    assert(rows(1L) > rows(leaf), "root not more central than a leaf")
  }

  test("DP release: noise matches the released-true gap, ε-scale plausible") {
    val rows = LinkOps.q264DpNoisyCounts.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val trueN = r.getAs[Long]("n_true")
      val rel = r.getAs[Long]("n_released")
      val noise = r.getAs[Double]("noise")
      assert(rel >= 0)
      val unclamped = math.max(math.rint(trueN + noise), 0.0)
      assert(math.abs(rel - unclamped) <= 0.5 + 1e-6,
        s"release ${rel} inconsistent with clamp(round($trueN + $noise))")
      assert(r.getAs[Long]("abs_err") == math.abs(rel - trueN))
    }
    // Laplace(2) has E|noise| = 2; the empirical mean should be in a wide band
    val meanAbsNoise = rows.map(r => math.abs(r.getAs[Double]("noise"))).sum / rows.length
    assert(meanAbsNoise > 0.3 && meanAbsNoise < 8.0, s"mean |noise| $meanAbsNoise")
  }

  test("Neyman: allocations sum exactly to the budget and track n_h·s_h") {
    val rows = LinkOps.q265NeymanAllocation.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("n_name"), r.getAs[Long]("nh"), r.getAs[Double]("sh"),
                 r.getAs[Double]("exact_alloc"), r.getAs[Long]("n_alloc")))
    assert(rows.nonEmpty)
    assert(rows.map(_._5).sum == 1000L, s"allocations sum to ${rows.map(_._5).sum}")
    rows.foreach { case (name, _, sh, exact, alloc) =>
      assert(sh > 0)
      assert(math.abs(alloc - exact) <= 1.0 + 1e-6,
        s"$name: integer alloc $alloc strays >1 from exact $exact")
    }
    // allocation order follows the n_h·s_h weight order
    val byWeight = rows.sortBy(r => -r._2 * r._3).map(_._1).take(3)
    val byAlloc = rows.sortBy(r => -r._5.toDouble).map(_._1).take(3)
    assert(byWeight.toSet == byAlloc.toSet,
      s"top-3 by weight $byWeight vs by allocation $byAlloc")
  }
}
