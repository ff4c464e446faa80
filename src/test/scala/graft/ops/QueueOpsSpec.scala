package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the Lindley wave (q401): the window-form
  * prefix-min identity is replayed against the literal sequential
  * recursion s_i = max(0, s_{i-1} + d_i).
  */
class QueueOpsSpec extends SparkTestBase {

  test("q401: window identity equals the sequential recursion") {
    val rows = QueueOps.q401LindleyDepth.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("part") -> r).toMap
    assert(rows.nonEmpty)

    val li = Tables(spark, sfDir).lineitem
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        unix_micros(col("l_shipdate").cast("timestamp")),
        when(col("l_returnflag") === "R", -col("l_quantity").cast("long"))
          .otherwise(col("l_quantity").cast("long")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    val replay = li.groupBy(_._1).map { case (part, moves) =>
      val ordered = moves.sortBy(m => (m._4, m._2, m._3))
      var s = 0L; var maxS = 0L; var stockouts = 0L; var lost = 0L
      ordered.foreach { m =>
        val raw = s + m._5
        if (raw < 0) { stockouts += 1; lost += -raw }
        s = math.max(0L, raw)
        maxS = math.max(maxS, s)
      }
      part -> (ordered.length.toLong, maxS, s, stockouts, lost)
    }
    // the query returns the top-100 stockout parts; each must match the
    // sequential replay exactly
    rows.foreach { case (part, r) =>
      val (n, maxD, fin, so, lost) = replay(part)
      assert(r.getAs[Long]("n_moves") == n, s"part $part n_moves")
      assert(r.getAs[Long]("max_depth") == maxD, s"part $part max_depth")
      assert(r.getAs[Long]("final_depth") == fin, s"part $part final_depth")
      assert(r.getAs[Long]("n_stockouts") == so, s"part $part stockouts")
      assert(r.getAs[Long]("units_lost") == lost, s"part $part lost")
    }
    // and the top-100 selection itself matches the replay's ordering
    val expectTop = replay.toSeq.filter(_._2._4 > 0)
      .sortBy { case (p, (_, _, _, so, lost)) => (-so, -lost, p) }
      .take(100).map(_._1).toSet
    assert(rows.keySet == expectTop)
  }
}
