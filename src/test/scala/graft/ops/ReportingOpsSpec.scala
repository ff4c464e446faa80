package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the reporting operators. */
class ReportingOpsSpec extends SparkTestBase {

  test("string_agg is sorted, complete, and partition-independent") {
    val rows = ReportingOps.q64StringAgg.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_nations")).sum == 25)
    rows.foreach { r =>
      val parts = r.getAs[String]("nations").split(",").toSeq
      assert(parts == parts.sorted)
      assert(parts.length == r.getAs[Long]("n_nations"))
    }
  }

  test("unpivot emits one (metric, value) row per measure per flag") {
    val rows = ReportingOps.q65Unpivot.fn(spark, sfDir).collect()
    val flags = rows.map(_.getAs[String]("l_returnflag")).distinct
    assert(rows.length == flags.length * 2)
    assert(rows.map(_.getAs[String]("metric")).toSet == Set("qty", "price"))
  }

  test("islands are disjoint maximal runs covering every active day") {
    val islands = ReportingOps.q66ActivityIslands.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"),
                 r.getAs[java.sql.Date]("island_start").toLocalDate,
                 r.getAs[java.sql.Date]("island_end").toLocalDate,
                 r.getAs[Long]("n_days")))
    val activeDays = EventOps.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    // each island's span equals its day count (runs are consecutive) and
    // the islands partition the active-day set
    islands.foreach { case (_, s, e, n) =>
      assert(java.time.temporal.ChronoUnit.DAYS.between(s, e) + 1 == n)
    }
    assert(islands.map(_._4).sum == activeDays)
    // maximality: islands of the same user never touch (gap >= 2 days)
    islands.groupBy(_._1).foreach { case (_, is) =>
      val sorted = is.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(java.time.temporal.ChronoUnit.DAYS.between(e1, s2) >= 2)
        case _ =>
      }
    }
  }

  test("rolling 7-day frame only ever includes days within value distance 6") {
    val rows = ReportingOps.q67RollingRevenue.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("day_num"), r.getAs[Double]("revenue"), r.getAs[Double]("rolling_7d")))
      .sortBy(_._1)
    val byDay = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (d, _, roll) =>
      val expect = (d - 6 to d).flatMap(byDay.get).sum
      assert(math.abs(roll - expect) < 1e-6, s"day $d: $roll vs $expect")
    }
  }

  test("conditional aggregates are consistent subsets of the total") {
    ReportingOps.q68ConditionalAgg.fn(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("n_finished") <= r.getAs[Long]("n_total"))
      assert(r.getAs[Long]("n_large") <= r.getAs[Long]("n_total"))
    }
  }

  test("rank family: rank has gaps after ties where dense_rank does not, quartiles are 1..4") {
    val rows = ReportingOps.q69RankFamily.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("quartile")).toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
    rows.groupBy(_.getAs[Number]("nationkey").longValue).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted
      val dense = rs.map(_.getAs[Long]("drnk")).sorted
      assert(ranks.max >= dense.max)            // gapped >= gapless
      assert(dense.distinct.length == dense.max) // dense_rank is contiguous
    }
  }
}
