package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the temporal-reachability wave (q395): the
  * min-arrival value iteration is replayed against an unpruned
  * path-enumerating BFS on the collected edge set.
  */
class TemporalGraphOpsSpec extends SparkTestBase {

  test("q395: pruned iteration equals unpruned temporal BFS") {
    val rows = TemporalGraphOps.q395TemporalReach.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("supplier") ->
        (r.getAs[java.sql.Date]("arrival_date").toString,
          r.getAs[Long]("wave"))).toMap
    assert(rows.nonEmpty)

    // rebuild edges exactly as the query does
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = li.groupBy(_._1).values.flatMap { sh =>
      val sorted = sh.sortBy(x => (x._3, x._2))
      sorted.zip(sorted.drop(1)).collect {
        case ((_, u, _), (_, v, t)) if u != v => (u, v, t)
      }
    }.toSet

    // unpruned BFS: states (node, arr); expand 4 waves, no min pruning
    val seedArr = java.time.LocalDate.of(1995, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    var states = Set[(Long, Long)]((0L, seedArr), (1L, seedArr),
      (2L, seedArr), (3L, seedArr))
    val best = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    def note(n: Long, a: Long, w: Long): Unit = {
      val (ca, cw) = best.getOrElse(n, (Long.MaxValue, Long.MaxValue))
      best(n) = (math.min(ca, a), math.min(cw, w))
    }
    states.foreach { case (n, a) => note(n, a, 0L) }
    for (w <- 1 to 4) {
      states = states.flatMap { case (n, a) =>
        edges.collect { case (u, v, t) if u == n && a <= t => (v, t) }
      }
      states.foreach { case (n, a) => note(n, a, w.toLong) }
    }
    assert(rows.keySet == best.keySet)
    best.foreach { case (n, (arr, wave)) =>
      val d = java.time.Instant.ofEpochMilli(arr / 1000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      assert(rows(n) == (d, wave), s"node $n: ${rows(n)} vs ($d, $wave)")
    }
  }
}
