package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the robustness & structure wave (q238–q241):
  * softmax direction, a full local label-propagation replay, whitening
  * moment identities, and the sharded top-k certificate.
  */
class RobustOpsSpec extends SparkTestBase {

  test("group DRO: weights form a softmax pointing at the hardest group") {
    val rows = RobustOps.q238GroupDroWeights.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Double]("mean_nll"), r.getAs[Double]("weight")))
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, s"weights sum ${rows.map(_._3).sum}")
    assert(rows.maxBy(_._2)._1 == rows.maxBy(_._3)._1,
      "hardest group (max mean_nll) is not the most up-weighted")
    assert(rows.forall(_._3 > 0))
  }

  test("label propagation: matches a full local 3-round replay, labels drawn from seed brands") {
    val out = RobustOps.q239LabelPropagation.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("part") ->
        (r.getAs[String]("seed_brand"), r.getAs[String]("community"))).toMap
    // rebuild the graph + seeds locally and replay 3 rounds
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }
    val edges = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val nbrs = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (n, g) => n -> g.map(_._2) }
    val brand = Tables(spark, sfDir).part
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var labels: Map[Long, String] = nbrs.keys.map(n => n -> brand(n)).toMap
    (1 to 3).foreach { _ =>
      labels = nbrs.map { case (n, ms) =>
        val votes = ms.map(labels).groupBy(identity).map { case (l, v) => (l, v.size) }
        n -> votes.toSeq.minBy { case (l, v) => (-v, l) }._1
      }
    }
    assert(out.size == labels.size)
    out.foreach { case (n, (seedB, comm)) =>
      assert(seedB == brand(n))
      assert(comm == labels(n), s"node $n: spark=$comm local=${labels(n)}")
    }
    val brands = brand.values.toSet
    assert(out.values.forall(v => brands(v._2)), "community label outside the seed set")
  }

  test("whitening: norms satisfy the moment identity, clip flags consistent") {
    val rows = RobustOps.q240DiagWhitening.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Double]("white_norm"), r.getAs[Double]("max_abs_z"), r.getAs[Long]("n_clipped")))
    val n = rows.length
    val dim = Tables.embeddingDim(sfDir)
    // sum over vectors of ||z||^2 = n * dim exactly when mu/sd are exact
    val total = rows.map(r => r._1 * r._1).sum
    assert(math.abs(total - n.toDouble * dim) / (n.toDouble * dim) < 0.01,
      s"sum ||z||^2 = $total, expected ~${n * dim}")
    rows.foreach { case (_, maxZ, clipped) =>
      assert((clipped > 0) == (maxZ > 4.0), "clip count inconsistent with max |z|")
    }
  }

  test("sharded top-k: certified, contiguous, ordered, and the argmax matches an independent count") {
    val rows = RobustOps.q241ShardedTopk.fn(spark, sfDir)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("token"),
                 r.getAs[Long]("n"), r.getAs[Boolean]("certified")))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3, "counts not non-increasing")
    }
    assert(rows.forall(_._4), s"top-10 token missed by shard nomination: ${rows.filterNot(_._4)}")
    val top1 = Tables(spark, sfDir).documents
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t").asc).limit(1).collect()(0)
    assert(rows.head._2 == top1.getString(0) && rows.head._3 == top1.getLong(1))
  }
}
