package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the grid-DBSCAN wave (q415): a driver-side
  * union-find over the same cell census must produce the identical
  * clusters, and the point-conservation law (core + border + noise = N)
  * holds.
  */
class GridClusterOpsSpec extends SparkTestBase {

  test("q415: union-find replay and point conservation") {
    val out = GridClusterOps.q415GridDbscan.fn(spark, sfDir).collect()
    assert(out.nonEmpty, "expect at least one dense cluster")
    val total = Tables(spark, sfDir).part.count()
    val clustered = out.map(r =>
      r.getAs[Long]("core_pts") + r.getAs[Long]("border_pts")).sum
    val noise = out.head.getAs[Long]("noise_pts")
    assert(out.forall(_.getAs[Long]("noise_pts") == noise))
    assert(clustered + noise == total, "core + border + noise = N")
    assert(out.forall(_.getAs[Long]("core_cells") >= 1))

    // driver-side replay: census -> threshold -> union-find -> borders
    val cells = Tables(spark, sfDir).part
      .select(floor(col("p_retailprice") / 100.0).cast("long").as("cx"),
        floor(col("p_size") / 5.0).cast("long").as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("cnt"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val n = cells.values.sum
    val minPts = math.max(3L, math.ceil(n.toDouble / cells.size).toLong)
    val core = cells.filter(_._2 >= minPts).keySet
    val parent = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    def find(c: (Long, Long)): (Long, Long) = {
      val p = parent.getOrElse(c, c)
      if (p == c) c else { val r = find(p); parent(c) = r; r }
    }
    for (a <- core; dx <- -1L to 1L; dy <- -1L to 1L) {
      val b = (a._1 + dx, a._2 + dy)
      if (core.contains(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.Ordering[(Long, Long)].max(ra, rb)) =
          math.Ordering[(Long, Long)].min(ra, rb)
      }
    }
    def key(c: (Long, Long)) = c._1 * 1000 + c._2
    val lbl = core.map(c => c -> key(find(c))).toMap
    val expectCore = lbl.groupBy(_._2).map { case (l, cs) =>
      l -> (cs.size.toLong, cs.keys.iterator.map(cells).sum) }
    val borders = (cells.keySet -- core).flatMap { b =>
      val adj = (for (dx <- -1L to 1L; dy <- -1L to 1L;
        c = (b._1 + dx, b._2 + dy) if core.contains(c)) yield lbl(c))
      if (adj.isEmpty) None else Some(b -> adj.min)
    }.toMap
    val expectBorder = borders.groupBy(_._2).map { case (l, bs) =>
      l -> (bs.size.toLong, bs.keys.iterator.map(cells).sum) }
    val got = out.map(r => r.getAs[Long]("cluster") ->
      (r.getAs[Long]("core_cells"), r.getAs[Long]("core_pts"),
        r.getAs[Long]("border_cells"), r.getAs[Long]("border_pts"))).toMap
    assert(got.keySet == expectCore.keySet)
    got.foreach { case (l, (cc, cp, bc, bp)) =>
      assert((cc, cp) == expectCore(l), s"core of cluster $l")
      assert((bc, bp) == expectBorder.getOrElse(l, (0L, 0L)), s"border of $l")
    }
  }
}
