package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the valuation & structure wave (q372–q373): the
  * KNN-Shapley recurrence against a full Scala brute force + the
  * efficiency axiom, and the LCC profile against an adjacency-set brute
  * force on the same capped graph.
  */
class ValuationOpsSpec extends SparkTestBase {

  test("q372: matches the per-point recurrence brute force and satisfies efficiency") {
    val rows = ValuationOps.q372KnnShapley.fn(spark, sfDir).collect()
    assert(rows.length == 20)
    // brute force: full recurrence over every (test, train) pair
    val e = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](0 max 2).map(_.toDouble).toArray))
    val test = e.filter(_._1 < 16)
    val train = e.filter(_._1 >= 16)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      val sa = a.map(x => x * x).sum; val sb = b.map(x => x * x).sum
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      math.rint((sa + sb - 2 * dot) * 1e9) / 1e9
    }
    val k = 5
    val vals = scala.collection.mutable.Map.empty[Long, Double]
    var effOk = true
    test.foreach { case (_, yt, vt) =>
      val sorted = train.map { case (id, y, v) => (d2(v, vt), id, y) }.sortBy(t => (t._1, t._2))
      val n = sorted.length
      val s = new Array[Double](n)
      s(n - 1) = (if (sorted(n - 1)._3 == yt) 1.0 else 0.0) / n
      for (j <- n - 2 to 0 by -1) {
        val mj = if (sorted(j)._3 == yt) 1.0 else 0.0
        val mn = if (sorted(j + 1)._3 == yt) 1.0 else 0.0
        s(j) = s(j + 1) + (mj - mn) * math.min(k, j + 1) / (k.toDouble * (j + 1))
      }
      // efficiency: sum of values = utility of the full set = matches in k-NN / k
      val util = sorted.take(k).count(_._3 == yt).toDouble / k
      if (math.abs(s.sum - util) > 1e-9) effOk = false
      sorted.zipWithIndex.foreach { case ((_, id, _), j) =>
        vals(id) = vals.getOrElse(id, 0.0) + s(j)
      }
    }
    assert(effOk, "efficiency axiom broke in the brute force itself")
    val avg = vals.view.mapValues(_ / test.length).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(math.abs(r.getAs[Double]("shapley") - avg(id)) < 1e-5,
        s"vec $id: ${r.getAs[Double]("shapley")} != brute-forced ${avg(id)}")
    }
    // top side dominates bottom side
    val top = rows.filter(_.getAs[String]("side") == "top").map(_.getAs[Double]("shapley"))
    val bot = rows.filter(_.getAs[String]("side") == "bottom").map(_.getAs[Double]("shapley"))
    assert(top.min >= bot.max)
    assert(bot.min < 0.0, "no harmful points found — valuation signal degenerate")
  }

  test("q373: LCC profile matches an adjacency-set brute force on the capped graph") {
    val rows = ValuationOps.q373LocalClustering.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lcc = r.getAs[Double]("avg_lcc")
      assert(lcc >= 0.0 && lcc <= 1.0)
      assert(r.getAs[Long]("deg") >= 2 && r.getAs[Long]("deg") <= 8)
    }
    // rebuild the capped graph in Scala from raw lineitem
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // row-level pairs, NOT distinct partkeys: the query's self-join counts
    // every row combination, so repeated (order, part) rows weight edges
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2))
    val edgeW = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.foreach { ps =>
      for (p1 <- ps; p2 <- ps if p1 < p2)
        edgeW((p1, p2)) = edgeW.getOrElse((p1, p2), 0) + 1
    }
    val edges = edgeW.filter(_._2 >= 2).keys.toSeq
    val nbrs = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (x, y) =>
      nbrs(x) = y :: nbrs.getOrElse(x, Nil); nbrs(y) = x :: nbrs.getOrElse(y, Nil)
    }
    val cappedList = nbrs.map { case (v, ns) => v -> ns.sorted.take(8).toSet }
    val keptAdj = scala.collection.mutable.Map.empty[Long, Set[Long]]
    edges.foreach { case (x, y) =>
      if (cappedList(x).contains(y) && cappedList(y).contains(x)) {
        keptAdj(x) = keptAdj.getOrElse(x, Set.empty) + y
        keptAdj(y) = keptAdj.getOrElse(y, Set.empty) + x
      }
    }
    val profile = keptAdj.toSeq.filter(_._2.size >= 2).map { case (v, ns) =>
      val nsSeq = ns.toSeq.sorted
      var tri = 0
      for (i <- nsSeq.indices; j <- i + 1 until nsSeq.length)
        if (keptAdj.getOrElse(nsSeq(i), Set.empty).contains(nsSeq(j))) tri += 1
      val lcc = BigDecimal(2.0 * tri / (ns.size.toDouble * (ns.size - 1)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      (ns.size.toLong, tri.toLong, lcc)
    }.groupBy(_._1)
    rows.foreach { r =>
      val d = r.getAs[Long]("deg")
      val g = profile(d)
      assert(r.getAs[Long]("n_vertices") == g.length.toLong, s"deg $d vertex count")
      assert(r.getAs[Long]("tri_sum") == g.map(_._2).sum, s"deg $d triangle mass")
      val exp = (g.map(_._3).sum / g.length).toDouble
      assert(math.abs(r.getAs[Double]("avg_lcc") -
        math.rint(exp * 1e6) / 1e6) < 2e-6, s"deg $d avg_lcc")
    }
  }
}
