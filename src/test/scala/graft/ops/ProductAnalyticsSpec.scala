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

  test("ols trend: slope/intercept match a local least-squares fit of the monthly frame") {
    val got = Analytics.q125OlsTrend.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    val t = Tables(spark, sfDir)
    val monthly = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .withColumn("tm", ((year(col("o_orderdate")) - 1995) * 12 +
        month(col("o_orderdate")) - 1).cast("long"))
      .groupBy(col("n_name"), col("tm"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    monthly.groupBy(_._1).foreach { case (nation, rows) =>
      val n = rows.length.toDouble
      val st = rows.map(_._2).sum.toDouble
      val stt = rows.map(r => r._2 * r._2).sum.toDouble
      val sy = rows.map(_._3).sum
      val sty = rows.map(r => r._2 * r._3).sum
      val slope = (n * sty - st * sy) / (n * stt - st * st)
      val intercept = (sy - slope * st) / n
      val (gn, gs, gi) = got(nation)
      assert(gn == rows.length)
      // local double fold vs the engine's exact-decimal fold: tolerance,
      // not equality — exactness vs DuckDB is the oracle's job
      assert(math.abs(gs - slope) < 1e-3, s"$nation slope $gs vs $slope")
      assert(math.abs(gi - intercept) < 1.0, s"$nation intercept $gi vs $intercept")
    }
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
