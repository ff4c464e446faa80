package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariants for the product-analytics wave (q120–q122); exactness vs
  * the naive SQL is the DuckDB oracle's job. */
class ProductAnalyticsSpec extends SparkTestBase {

  test("event paths: occurrence mass equals sum over users of (n_events - 2)") {
    val rows = ProductAnalytics.q120EventPaths.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalPaths = rows.map(_.getLong(1)).sum
    val expected = EventOps.events(spark, sfDir)
      .groupBy(col("user_id")).count().collect()
      .map(r => math.max(0L, r.getLong(1) - 2)).sum
    assert(totalPaths == expected)
    // paths live in the 5-type alphabet
    assert(rows.forall(_.getString(0).split(">").forall(
      Set("click", "view", "purchase", "signup", "error"))))
  }

  test("retention cohorts: offset 0 is full retention, ratios never exceed 1") {
    val rows = ProductAnalytics.q121RetentionCohorts.fn(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, cohort) =>
      val zero = cohort.filter(_._2 == 0L)
      assert(zero.length == 1 && zero.head._5 == 1.0,
        "every user is active on their own first day")
    }
    assert(rows.forall(r => r._5 > 0.0 && r._5 <= 1.0 && r._3 <= r._4))
  }

  test("association rules: confidences bounded, support consistent, lift symmetric in the marginals") {
    val rows = ProductAnalytics.q122AssociationRules.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sxy, sx, sy) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (cxy, cyx, lift) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(sxy >= 2 && sxy <= math.min(sx, sy))
      assert(cxy > 0 && cxy <= 1.0 && cyx > 0 && cyx <= 1.0)
      assert(lift > 0)
    }
  }
}
