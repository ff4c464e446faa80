package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** q473 semantics: an independent driver-side SCC computation (BFS-based
  * forward/backward reachability on the collected edge list) must
  * reproduce every label and size, and the condensation must be acyclic
  * (the defining property of an SCC quotient). */
class SccOpsSpec extends SparkTestBase {

  test("q473: driver-side SCC replay; condensation is a DAG") {
    val rows = SccOps.q473Scc.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("nation") ->
        (r.getAs[Long]("scc_id"), r.getAs[Long]("scc_size"),
         r.getAs[Long]("internal_out_deg"), r.getAs[Long]("n_condensation_edges")))
      .toMap

    val edges = GraphBase.tradeEdgesDirected(spark, sfDir)
      .select(col("u"), col("v")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val radj = edges.groupBy(_._2).map { case (v, es) => v -> es.map(_._1) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2))

    def bfs(start: Int, g: Map[Int, Set[Int]]): Set[Int] = {
      val seen = mutable.Set[Int]()
      var frontier = g.getOrElse(start, Set.empty[Int])
      while (frontier.nonEmpty) {
        val fresh = frontier -- seen
        seen ++= fresh
        frontier = fresh.flatMap(n => g.getOrElse(n, Set.empty[Int]))
      }
      seen.toSet
    }

    val scc = nodes.map { u =>
      val both = bfs(u, adj) intersect bfs(u, radj)
      u -> (both + u).min.toLong
    }.toMap
    val sizes = scc.values.groupBy(identity).map { case (id, xs) => id -> xs.size.toLong }
    val internal = edges.toSeq
      .filter { case (u, v) => scc(u) == scc(v) }
      .groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val condensation = edges.map { case (u, v) => (scc(u), scc(v)) }
      .filter { case (a, b) => a != b }

    val names = Tables(spark, sfDir).nation.collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name")).toMap

    assert(rows.size == nodes.size, "one row per graph node")
    nodes.foreach { u =>
      val (id, size, ideg, ncond) = rows(names(u))
      assert(id == scc(u), s"scc label of node $u")
      assert(size == sizes(scc(u)), s"scc size of node $u")
      assert(ideg == internal.getOrElse(u, 0L), s"internal out-degree of $u")
      assert(ncond == condensation.size.toLong, "condensation edge count")
    }
    // the fixture must exercise real structure: at least one non-trivial SCC
    assert(sizes.values.exists(_ > 1), "no cyclic bloc in fixture — SCC untested")

    // condensation is acyclic: Kahn peeling consumes every edge
    val cnodes = mutable.Set[Long]() ++ condensation.flatMap(e => Seq(e._1, e._2))
    val cedges = mutable.Set[(Long, Long)]() ++ condensation
    var progress = true
    while (progress && cedges.nonEmpty) {
      val sinksLess = cnodes.filter(n => !cedges.exists(_._2 == n)).toSet
      progress = sinksLess.nonEmpty
      cedges.retain { case (a, _) => !sinksLess.contains(a) }
      cnodes --= sinksLess
    }
    assert(cedges.isEmpty, "condensation contains a cycle — SCC labels wrong")
  }
}
