package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantic checks for the cycle-census wave (q425): a driver-side BFS
  * over the same nation edge list replays every min cycle length, and
  * the 2-cycle ⟺ mutual-edge law holds.
  */
class CycleOpsSpec extends SparkTestBase {

  test("q425: BFS replay and the mutual-edge law") {
    val out = CycleOps.q425CycleCensus.fn(spark, sfDir).collect()
    assert(out.nonEmpty)

    val t = Tables(spark, sfDir)
    val li = t.lineitem
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sid"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ts"))
    val wSeq = Window.partitionBy(col("p")).orderBy(col("ts"), col("sid"))
    val sn = t.supplier.collect()
      .map(r => r.getAs[Number]("s_suppkey").longValue ->
        r.getAs[Number]("s_nationkey").longValue).toMap
    val edges = li.withColumn("nv", lead(col("sid"), 1).over(wSeq))
      .where(col("nv").isNotNull && col("nv") =!= col("sid"))
      .select(col("sid"), col("nv")).collect()
      .map(r => (sn(r.getLong(0)), sn(r.getLong(1))))
      .filter(e => e._1 != e._2).distinct
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    def minCycle(o: Long): Option[Long] = {
      var frontier = adj.getOrElse(o, Set.empty[Long])
      for (k <- 1 to 6) {
        if (frontier.contains(o)) return Some(k.toLong)
        frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty[Long]))
      }
      if (frontier.isEmpty) None else None
    }
    val names = t.nation.collect()
      .map(r => r.getAs[String]("n_name") ->
        r.getAs[Number]("n_nationkey").longValue).toMap
    out.foreach { r =>
      val nk = names(r.getAs[String]("nation"))
      val expect = minCycle(nk)
      val got = if (r.isNullAt(r.fieldIndex("min_cycle_len"))) None
        else Some(r.getAs[Long]("min_cycle_len"))
      assert(got == expect, s"cycle length of ${r.getAs[String]("nation")}")
      // 2-cycle iff a mutual partner exists
      val mutual = r.getAs[Long]("n_mutual")
      if (mutual > 0) assert(got.exists(_ <= 2), "mutual edge => 2-cycle")
      assert(r.getAs[Long]("out_deg") <= 24 && r.getAs[Long]("in_deg") <= 24)
      assert(mutual == adj.getOrElse(nk, Set.empty)
        .count(v => adj.getOrElse(v, Set.empty).contains(nk)).toLong)
    }
  }
}
