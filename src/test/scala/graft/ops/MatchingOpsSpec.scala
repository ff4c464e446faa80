package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Semantic checks for the matching wave (q427): a driver-side
  * nearest-neighbor replay over the same units reproduces the ATT and
  * distance diagnostics; matching laws hold.
  */
class MatchingOpsSpec extends SparkTestBase {

  test("q427: driver-side nearest-control replay") {
    val r = MatchingOps.q427NnMatching.fn(spark, sfDir).head()
    assert(r.getAs[Double]("p50_dist") <= r.getAs[Double]("p90_dist"))
    assert(r.getAs[Long]("n_controls_used") <= r.getAs[Long]("n_treated"))
    assert(r.getAs[Long]("n_controls_used") <= r.getAs[Long]("n_control"))

    val t = Tables(spark, sfDir)
    val units = t.customer
      .select(col("c_custkey").as("ck"), col("c_acctbal").as("x"),
        (col("c_mktsegment") === "BUILDING").cast("int").as("z"))
      .join(t.orders.groupBy(col("o_custkey").as("ck"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("y")), Seq("ck"), "left")
      .na.fill(0.0, Seq("y"))
      .collect().map(u => (u.getAs[Long]("ck"), u.getAs[Double]("x"),
        u.getAs[Int]("z"), u.getAs[Double]("y")))
    val controls = units.filter(_._3 == 0).sortBy(c => (c._2, c._1))
    val treated = units.filter(_._3 == 1)
    assert(r.getAs[Long]("n_treated") == treated.length.toLong)
    assert(r.getAs[Long]("n_control") == controls.length.toLong)
    val matches = treated.map { case (ck, x, _, y) =>
      // nearest by |x diff|; tie -> the lower-covariate control, then
      // lower custkey (the below/above window contract)
      val below = controls.takeWhile(c => c._2 < x || (c._2 == x && c._1 <= ck))
        .lastOption
      val aboveIdx = controls.indexWhere(c => c._2 > x || (c._2 == x && c._1 > ck))
      val above = if (aboveIdx < 0) None else Some(controls(aboveIdx))
      val pick = (below, above) match {
        case (Some(b), Some(a)) =>
          if (math.abs(x - b._2) <= math.abs(x - a._2)) b else a
        case (Some(b), None) => b
        case (None, Some(a)) => a
        case _ => sys.error("no controls")
      }
      (ck, y, pick._1, pick._4, math.abs(x - pick._2))
    }
    val att = BigDecimal(matches.map(m => BigDecimal(m._2 - m._4)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
      treated.length).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("att") == att)
    assert(r.getAs[Long]("n_controls_used") ==
      matches.map(_._3).distinct.length.toLong)
    val dists = matches.map(_._5).sorted
    val p50 = dists((treated.length + 1) / 2 - 1)
    assert(r.getAs[Double]("p50_dist") == p50)
  }
}
