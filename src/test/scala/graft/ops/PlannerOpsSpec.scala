package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q477/q479 semantics: the HRU greedy replayed independently from
  * separately-computed view sizes, and the q-error laws (q ≥ 1; exact
  * FK-join cardinality equals the fact side under referential
  * integrity). */
class PlannerOpsSpec extends SparkTestBase {

  test("q477: greedy replay from independently-computed view sizes; cost monotone") {
    val rows = PlannerOps.q477ViewSelection.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.length == 3)

    // independent sizes: one countDistinct per view, no cube
    val li = Tables(spark, sfDir).lineitem.select(
      col("l_returnflag").as("r"), col("l_linestatus").as("st"),
      year(col("l_shipdate")).as("y"))
    def sizeOf(mask: Int): Long = {
      val dims = Seq(4 -> "r", 2 -> "st", 1 -> "y")
        .collect { case (b, c) if (mask & b) != 0 => col(c) }
      if (dims.isEmpty) 1L else li.select(dims: _*).distinct().count()
    }
    val sizes = (0 to 7).map(v => v -> sizeOf(v)).toMap

    var mat = Set(7)
    def cost(w: Int): Long = mat.filter(v => (w & v) == w).map(sizes).min
    rows.foreach { case (round, pick, size, benefit, after) =>
      val best = (0 to 7).filterNot(mat.contains).map { v =>
        v -> (0 to 7).filter(w => (w & v) == w)
          .map(w => math.max(0L, cost(w) - sizes(v))).sum
      }.sortBy { case (v, b) => (-b, sizes(v), v) }.head
      assert(pick == best._1, s"round $round pick")
      assert(benefit == best._2, s"round $round benefit")
      assert(size == sizes(best._1.toInt), s"round $round size")
      mat += best._1
      assert(after == (0 to 7).map(cost).sum, s"round $round total cost")
    }
    // greedy benefits are non-increasing and total cost is monotone down
    assert(rows.map(_._4).sliding(2).forall(p => p.head >= p.last))
    assert(rows.map(_._5).sliding(2).forall(p => p.head >= p.last))
  }

  test("q479: q-error >= 1; FK joins' exact cardinality equals the fact side") {
    val rows = PlannerOps.q479QerrorAudit.fn(spark, sfDir).collect()
    assert(rows.length == 4)
    val nLineitem = Tables(spark, sfDir).lineitem.count()
    val nOrders = Tables(spark, sfDir).orders.count()
    rows.foreach { r =>
      assert(r.getAs[Double]("q_error") >= 1.0, r.getAs[String]("join_edge"))
      val expected = r.getAs[String]("join_edge") match {
        case "customer*orders" => nOrders
        case _ => nLineitem
      }
      // the parent side is a PK: every fact row matches exactly once
      assert(r.getAs[Long]("actual_rows") == expected,
        s"${r.getAs[String]("join_edge")} actual cardinality")
    }
  }
}
