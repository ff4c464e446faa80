package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the experimentation & linkage-audit wave
  * (q351–q353): CUPED identities vs brute force, the SPRT walk replayed,
  * and blocking refinement laws.
  */
class TrialOpsSpec extends SparkTestBase {

  test("q351: theta and variances match brute force; CUPED never increases variance") {
    val dir = "/root/testdata/sf0.01"
    val r = TrialOps.q351Cuped.fn(spark, dir).collect().head
    val xy = EventOps.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .collect().groupBy(_.getLong(0)).toSeq.map { case (u, evs) =>
        val x = evs.count(e => e.getString(2) == "click" &&
          !e.getDate(1).toLocalDate.isAfter(java.time.LocalDate.parse("2024-01-14")))
        val y = evs.count(e => e.getString(2) == "purchase" &&
          !e.getDate(1).toLocalDate.isBefore(java.time.LocalDate.parse("2024-01-15")))
        (x.toLong, y.toLong)
      }
    val n = xy.size.toLong
    assert(r.getAs[Long]("n_users") == n)
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(t => t._1 * t._1).sum
    val sxy = xy.map(t => t._1 * t._2).sum
    val theta = BigDecimal((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-12)
    assert(r.getAs[Double]("var_cuped") <= r.getAs[Double]("var_y") + 1e-12,
      "CUPED increased variance — regression identity broken")
    assert(r.getAs[Double]("var_reduction_pct") > 0,
      "zero variance reduction — covariate carries no signal in fixture")
  }

  test("q352: the LLR walk is the cumulative sum of its daily terms and verdicts match the bounds") {
    val rows = TrialOps.q352Sprt.fn(spark, "/root/testdata/sf0.01").collect()
      .sortBy(_.getAs[java.sql.Date]("day").getTime)
    assert(rows.length >= 28)
    val bound = 2.944438979166441
    rows.foreach { r =>
      val llr = r.getAs[Double]("llr")
      val expect = if (llr >= bound) "reject_h0"
        else if (llr <= -bound) "accept_h0" else "continue"
      assert(r.getAs[String]("verdict") == expect)
    }
    // under H0-true data (p1 > p0 but the rate stays at baseline) the walk
    // must trend down, not up
    assert(rows.last.getAs[Double]("llr") < rows.head.getAs[Double]("llr"),
      "LLR did not drift toward accept_h0 on stationary data")
  }

  test("q353: refinement laws hold and the lang candidate count matches brute force") {
    val dir = sfDir
    val rows = TrialOps.q353BlockingQuality.fn(spark, dir).collect()
      .map(r => r.getAs[String]("scheme") -> r).toMap
    assert(rows.size == 3)
    rows.values.foreach { r =>
      assert(r.getAs[Double]("completeness") >= 0 && r.getAs[Double]("completeness") <= 1)
      assert(r.getAs[Double]("reduction_ratio") >= 0 && r.getAs[Double]("reduction_ratio") < 1)
    }
    // (lang, lenbucket) refines lang: fewer candidates, no higher completeness
    val lang = rows("lang"); val fine = rows("lang_lenbucket")
    assert(fine.getAs[Long]("n_cand") <= lang.getAs[Long]("n_cand"))
    assert(fine.getAs[Double]("completeness") <= lang.getAs[Double]("completeness") + 1e-12)
    // brute-force the lang scheme's candidate count
    val langSizes = Tables(spark, dir).documents
      .select(col("lang"), col("text")).collect()
      .filter(r => "\\w+".r.findAllIn(r.getString(1).toLowerCase).size >= 3)
      .groupBy(_.getString(0)).map(_._2.length.toLong)
    val brute = langSizes.map(s => s * (s - 1) / 2).sum
    assert(lang.getAs[Long]("n_cand") == brute)
    // truth is non-empty; lang blocking catches some but NOT all pairs on
    // this fixture (template families cross languages — measured 0.286),
    // which is exactly the trade the audit exists to expose
    assert(lang.getAs[Long]("n_truth") > 0)
    assert(lang.getAs[Double]("completeness") > 0.0 &&
      lang.getAs[Double]("completeness") < 1.0,
      "lang blocking is all-or-nothing — audit undiscriminating")
  }
}
