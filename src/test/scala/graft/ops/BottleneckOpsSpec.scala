package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantic checks for the widest-path wave (q409): the max-min
  * propagation is replayed by a driver-side Bellman-Ford over the same
  * edge list, and the semiring laws (seed bottleneck, cap dominance)
  * hold on every output row.
  */
class BottleneckOpsSpec extends SparkTestBase {

  test("q409: driver-side max-min Bellman-Ford replays the propagation") {
    val out = BottleneckOps.q409WidestPath.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("supplier"), r.getAs[Long]("bottleneck"),
        r.getAs[Long]("wave")))
    assert(out.nonEmpty)
    // seeds come out at full source capacity, wave 0
    out.filter(_._1 <= 3).foreach { case (_, b, w) =>
      assert(b == 1000000L && w == 0L)
    }

    // rebuild the same edge list and replay 4 rounds in plain Scala
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sid"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("t"),
        col("l_quantity").cast("long").as("q"))
    val wSeq = Window.partitionBy(col("p")).orderBy(col("t"), col("sid"))
    val edges = li
      .withColumn("nv", lead(col("sid"), 1).over(wSeq))
      .withColumn("cap", lead(col("q"), 1).over(wSeq))
      .where(col("nv").isNotNull && col("nv") =!= col("sid"))
      .groupBy(col("sid"), col("nv")).agg(max(col("cap")).as("cap"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var best = Map[Long, (Long, Long)]()
    (0L to 3L).foreach(s => best += s -> (1000000L, 0L))
    for (r <- 1 to 4) {
      val reached = best
      edges.foreach { case (u, v, cap) =>
        reached.get(u).foreach { case (ub, _) =>
          val nb = math.min(ub, cap)
          val cur = best.get(v)
          val merged = cur match {
            case Some((cb, cw)) => (math.max(cb, nb), math.min(cw, r.toLong))
            case None           => (nb, r.toLong)
          }
          best += v -> merged
        }
      }
    }
    assert(out.map(t => t._1 -> ((t._2, t._3))).toMap == best)
    // every non-seed bottleneck is bounded by some incident edge cap
    val capMax = edges.groupBy(_._2).map { case (v, es) =>
      v -> es.map(_._3).max }
    out.filter(_._3 > 0).foreach { case (v, b, _) =>
      assert(b <= capMax(v), s"bottleneck at $v exceeds best incident cap")
    }
  }
}
