package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the k-truss wave (q380): the peeling trace is
  * replayed over an adjacency-set brute force on the same capped graph,
  * and the fixpoint/monotonicity laws hold.
  */
class TrussOpsSpec extends SparkTestBase {

  test("q380: trace matches the brute-forced cascade and reaches a fixpoint") {
    val rows = TrussOps.q380KtrussPeeling.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("iteration"))
    assert(rows.length == 6)
    // laws: edge counts chain and never grow; removals hit zero
    rows.sliding(2).foreach { p =>
      if (p.length == 2)
        assert(p(0).getAs[Long]("edges_after") == p(1).getAs[Long]("edges_before"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_removed") ==
        r.getAs[Long]("edges_before") - r.getAs[Long]("edges_after"))
      assert(r.getAs[Long]("n_removed") >= 0)
    }
    assert(rows.last.getAs[Long]("n_removed") == 0L,
      "6 rounds must reach the 4-truss fixpoint on this fixture")

    // brute force: same capped graph (the q373 spec construction), peel
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2))
    val edgeW = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.foreach { ps =>
      for (p1 <- ps; p2 <- ps if p1 < p2)
        edgeW((p1, p2)) = edgeW.getOrElse((p1, p2), 0) + 1
    }
    val rawEdges = edgeW.filter(_._2 >= 2).keys.toSeq
    val nbrs = scala.collection.mutable.Map.empty[Long, List[Long]]
    rawEdges.foreach { case (x, y) =>
      nbrs(x) = y :: nbrs.getOrElse(x, Nil); nbrs(y) = x :: nbrs.getOrElse(y, Nil)
    }
    val capped = nbrs.map { case (v, ns) => v -> ns.sorted.take(8).toSet }
    var kept = rawEdges.filter { case (x, y) =>
      capped(x).contains(y) && capped(y).contains(x)
    }.toSet
    rows.foreach { r =>
      assert(r.getAs[Long]("edges_before") == kept.size.toLong,
        s"iteration ${r.getAs[Long]("iteration")}: edges_before")
      val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      kept.foreach { case (x, y) =>
        adj(x) = adj.getOrElse(x, Set.empty) + y
        adj(y) = adj.getOrElse(y, Set.empty) + x
      }
      def support(e: (Long, Long)): Int =
        (adj.getOrElse(e._1, Set.empty) & adj.getOrElse(e._2, Set.empty)).size
      kept = kept.filter(support(_) >= 2)
      assert(r.getAs[Long]("edges_after") == kept.size.toLong,
        s"iteration ${r.getAs[Long]("iteration")}: edges_after")
    }
  }
}
