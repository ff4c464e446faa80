package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the layout & allocation wave (q234–q237): the HRW
  * minimal-movement law, a brute-force KS replay, a brute-force
  * assortativity replay, and the water-filling feasibility invariants.
  */
class AllocOpsSpec extends SparkTestBase {

  test("rendezvous sharding: the HRW law holds — a doc keeps its shard or moves to the new one") {
    import graft.functions.VectorFunctions.md5LongLocal
    val rows = AllocOps.q234RendezvousSharding.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n8"), r.getAs[Long]("n_stay"), r.getAs[Long]("n_moved_away"), r.getAs[Long]("n9")))
      .toMap
    assert(rows.keySet == (0L to 8L).toSet)
    rows.foreach { case (sh, (n8, stay, moved, n9)) =>
      if (sh < 8) assert(n8 == stay + moved && n9 == stay, s"shard $sh inconsistent")
    }
    // conservation: everyone lands somewhere, before and after
    val total8 = rows.collect { case (s, (n8, _, _, _)) if s < 8 => n8 }.sum
    assert(rows.values.map(_._4).sum == total8)
    // local HRW replay on the doc ids
    val ids = Tables(spark, sfDir).documents.select(col("doc_id"))
      .collect().map(_.getLong(0))
    def shard(id: Long, n: Int): Int =
      (0 until n).maxBy(s => (md5LongLocal(s"$id|$s"), -s))
    val moved = ids.count(id => shard(id, 9) == 8)
    ids.foreach { id =>
      val s8 = shard(id, 8); val s9 = shard(id, 9)
      assert(s9 == s8 || s9 == 8, s"doc $id jumped $s8 -> $s9: HRW law violated")
    }
    assert(rows(8L)._4 == moved)
    // the newcomer takes roughly 1/9: between 3% and 25% on 500 docs
    assert(moved > ids.length / 33 && moved < ids.length / 4)
  }

  test("KS drift: brute-force replay of one source's D statistic matches") {
    val out = AllocOps.q235KsDrift.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("ks_d")).toMap
    assert(out.nonEmpty && out.values.forall(d => d >= 0.0 && d <= 1.0))
    val scored = Tables(spark, sfDir).documents
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("source"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks"))).as("score"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Double]("score")))
    val src = scored.map(_._2).min // deterministic pick
    val sorted = scored.sortBy(r => (r._3, r._1))
    val nS = sorted.count(_._2 == src).toDouble
    val nR = sorted.length - nS
    var cumS = 0.0; var cumR = 0.0; var d = 0.0
    sorted.foreach { r =>
      if (r._2 == src) cumS += 1 else cumR += 1
      d = math.max(d, math.abs(cumS / nS - cumR / nR))
    }
    assert(math.abs(out(src) - d) < 1e-6, s"KS mismatch for $src: ${out(src)} vs $d")
  }

  test("assortativity: matches a brute-force Pearson over the support-2 edge list, in [-1, 1]") {
    val row = AllocOps.q236DegreeAssortativity.fn(spark, sfDir).collect()(0)
    val r = row.getAs[Double]("assortativity")
    assert(r >= -1.0 && r <= 1.0)
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }
    val edges = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val directed = edges.flatMap(e => Seq(e, e.swap))
    val deg = directed.groupBy(_._1).map { case (n, g) => n -> g.size.toLong }
    val xs = directed.map(e => (deg(e._1), deg(e._2)))
    val m = xs.length.toLong
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxy = xs.map(t => t._1 * t._2).sum
    val sxx = xs.map(t => t._1 * t._1).sum; val syy = xs.map(t => t._2 * t._2).sum
    val expect = (m * sxy - sx * sy).toDouble /
      (math.sqrt((m * sxx - sx * sx).toDouble) * math.sqrt((m * syy - sy * sy).toDouble))
    assert(math.abs(r - expect) < 1e-6, s"assortativity $r vs brute force $expect")
    assert(row.getAs[Long]("n_edges") == edges.length)
  }

  test("water filling: allocations are feasible, exhaust the budget, and share one level") {
    val rows = AllocOps.q237WaterFilling.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("cap"),
                 r.getAs[Long]("budget"), r.getAs[Double]("alloc"),
                 r.getAs[Boolean]("kept_all")))
    assert(rows.nonEmpty)
    val budget = rows.head._3.toDouble
    assert(math.abs(rows.map(_._4).sum - budget) < 1e-3,
      s"allocations ${rows.map(_._4).sum} do not exhaust budget $budget")
    rows.foreach { case (src, cap, _, alloc, kept) =>
      assert(alloc <= cap + 1e-9, s"$src allocated over cap")
      assert(kept == (math.abs(alloc - cap) < 1e-9), s"$src kept_all flag wrong")
    }
    // every cut source is cut to the SAME water level
    val cutLevels = rows.filter(!_._5).map(_._4).distinct
    assert(cutLevels.length <= 1, s"multiple water levels: $cutLevels")
    // and the budget genuinely binds: at least one source is cut
    assert(cutLevels.nonEmpty, "no source cut — budget not binding")
  }
}
