package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Semantic checks for the centrality wave (q432): an independent
  * driver-side Brandes computation on the collected thinned edge list
  * must reproduce every betweenness and closeness value exactly.
  */
class BetweennessOpsSpec extends SparkTestBase {

  test("q432: driver-side Brandes replay on the thinned graph") {
    val rows = BetweennessOps.q432Betweenness.fn(spark, sfDir).collect()

    // rebuild the top-3 edge list exactly as the query does
    val t = Tables(spark, sfDir)
    val li = t.lineitem.select(col("l_partkey").as("p"),
      col("l_suppkey").as("sid"),
      unix_micros(col("l_shipdate").cast("timestamp")).as("ts"))
    val sup = t.supplier.select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byPart = li.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val handoffs = byPart.values.flatMap { xs =>
      val s = xs.sortBy(x => (x._3, x._2))
      s.zip(s.tail).collect { case (a, b)
        if a._2 != b._2 && sup(a._2) != sup(b._2) => (sup(a._2), sup(b._2)) }
    }.toSeq
    val weights = handoffs.groupBy(identity).map { case (e, xs) => e -> xs.size }
    val adj = weights.keys.groupBy(_._1).map { case (u, es) =>
      u -> es.toSeq.map(e => (e._2, weights(e)))
        .sortBy { case (v, w) => (-w, v) }.take(3).map(_._1)
    }
    val nodes = (adj.keys ++ adj.values.flatten).toSeq.distinct.sorted
    assert(rows.length == nodes.length, "one row per node in the thinned graph")
    // BFS (≤6 hops) per source: distances + path counts
    val d = mutable.Map[(Int, Int), Int](); val sig = mutable.Map[(Int, Int), Long]()
    for (s <- nodes) {
      var frontier = Map(s -> 1L); var dist = 0
      val seen = mutable.Map(s -> 0)
      while (dist < 6 && frontier.nonEmpty) {
        dist += 1
        val nxt = mutable.Map[Int, Long]()
        for ((u, c) <- frontier; v <- adj.getOrElse(u, Nil))
          if (!seen.contains(v) || seen(v) == dist)
            nxt(v) = nxt.getOrElse(v, 0L) + c
        nxt.keys.foreach(v => seen.getOrElseUpdate(v, dist))
        frontier = nxt.filter { case (v, _) => seen(v) == dist }.toMap
        frontier.foreach { case (v, c) =>
          if (v != s) { d((s, v)) = dist; sig((s, v)) = sig.getOrElse((s, v), 0L) + c }
        }
      }
    }
    // pair-sum betweenness with the query's scaled-long accumulator
    val bc9 = mutable.Map[Int, Long]().withDefaultValue(0L)
    for (((s, v), d1) <- d; ((v2, tt), d2) <- d
         if v2 == v && s != tt && d.get((s, tt)).contains(d1 + d2))
      bc9(v) += math.round(sig((s, v)).toDouble * sig((v, tt)) / sig((s, tt)) * 1e9)
    val names = t.nation.collect()
      .map(r => r.getAs[String]("n_name") -> r.getAs[Int]("n_nationkey")).toMap
    rows.foreach { row =>
      val nk = names(row.getAs[String]("nation"))
      val exp = BigDecimal(bc9(nk).toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getAs[Double]("betweenness") == exp,
        s"betweenness of nation $nk")
      val reach = d.keys.count(_._1 == nk).toLong
      assert(row.getAs[Long]("n_reach") == reach)
      val sumD = d.collect { case ((s, _), dd) if s == nk => dd.toLong }.sum
      assert(row.getAs[Long]("sum_d") == sumD)
    }
    assert(rows.exists(_.getAs[Double]("betweenness") > 0),
      "the thinned graph must have at least one broker")

    // horizon is vacuous: an UNBOUNDED BFS must reach no pair beyond 6
    // hops, so the query's k<=6 walk unroll loses nothing on this graph
    // (the documented contract in BetweennessOps' header).
    for (s <- nodes) {
      val seen = mutable.Map(s -> 0)
      var frontier = Set(s); var dist = 0
      while (frontier.nonEmpty) {
        dist += 1
        frontier = frontier.flatMap(u => adj.getOrElse(u, Nil))
          .filterNot(seen.contains)
        frontier.foreach(v => seen(v) = dist)
      }
      val diam = (seen - s).values.foldLeft(0)(math.max)
      assert(diam <= 6, s"thinned-graph eccentricity of $s is $diam > 6 — " +
        "the 6-hop horizon would truncate; raise the unroll bound")
    }
  }
}
