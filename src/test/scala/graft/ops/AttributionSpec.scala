package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contracts for the attribution/sampling/concentration wave. */
class AttributionSpec extends SparkTestBase {

  test("q138: attribution conserves conversions and revenue exactly") {
    val rows = graft.SparkEntry.queries("q138_first_touch")(spark, sfDir)
      .collect()
    val ev = EventOps.events(spark, sfDir).filter(col("event_type") === "purchase")
    val total = ev.count()
    assert(rows.map(_.getLong(1)).sum == total,
      "every purchase must land in exactly one channel")
    val channels = rows.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("click", "view", "direct")), channels.toString)
  }

  test("q139: quota holds exactly — min(30, stratum size) per language") {
    val rows = graft.SparkEntry.queries("q139_fixed_quota_sample")(spark, sfDir)
      .collect()
    val strata = Tables(spark, sfDir).documents
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == strata.keySet)
    rows.foreach { r =>
      val want = math.min(30L, strata(r.getString(0)))
      assert(r.getLong(1) == want, s"${r.getString(0)}: ${r.getLong(1)} != $want")
      assert(r.getLong(3) == want) // max_rank == n_sampled
    }
  }

  test("q140: gini lies in [0,1) and responds to concentration") {
    val rows = graft.SparkEntry.queries("q140_gini_concentration")(spark, sfDir)
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val g = r.getDouble(3)
      assert(g >= 0.0 && g < 1.0, s"${r.getString(0)}: gini $g")
    }
    // sanity on the estimator itself: a hand-built skewed series scores
    // higher than a uniform one
    import spark.implicits._
    def gini(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      2.0 * s.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum /
        (n * s.sum) - (n + 1.0) / n
    }
    assert(gini(Seq(1, 1, 1, 1, 96).map(_.toDouble)) >
           gini(Seq(20, 20, 20, 20, 20).map(_.toDouble)) + 0.5)
  }
}
