package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q484 semantics: the approx coefficient is exactly the series total
  * (the transform conserves the sum), energy shares are Parseval-valid,
  * and the emitted synopsis is the claimed top-k by energy-ordered rank. */
class WaveletOpsSpec extends SparkTestBase {

  test("q484: approx coef = series total; shares consistent; ranks well-formed") {
    val rows = WaveletOps.q484HaarSynopsis.fn(spark, sfDir).collect()
    assert(rows.length == 9, "approx + top-8 details")
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (0L to 8L),
      "ranks must be 0..8 exactly once")

    // the level-6 approx coefficient of the unnormalized transform IS the
    // series total: recompute the 64-day KILOdollar revenue independently,
    // matching l0's per-day quantization (sum dollars per day, THEN
    // floor-divide each day by 1000, then sum the 64 day values)
    val truth = Tables(spark, sfDir).lineitem
      .select(datediff(col("l_shipdate").cast("date"),
        lit("1995-01-01").cast("date")).as("pos"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("long").as("r"))
      .filter(col("pos") >= 0 && col("pos") < 64)
      .groupBy(col("pos")).agg(sum(col("r")).as("day"))
      .select(floor(col("day") / 1000).cast("long").as("kd"))
      .agg(sum(col("kd"))).head().getLong(0)
    val approx = rows.find(_.getAs[String]("kind") == "approx").get
    assert(approx.getAs[Long]("rank") == 0L)
    assert(approx.getAs[Long]("coef") == truth,
      s"approx coef ${approx.getAs[Long]("coef")} != series total $truth")

    // Parseval accounting: every share in (0, 1]; the kept fraction is
    // >= the approx share alone and <= 1, identical on every row
    val fracs = rows.map(_.getAs[Double]("kept_energy_frac")).distinct
    assert(fracs.length == 1, "kept_energy_frac must be a single report value")
    val shares = rows.map(_.getAs[Double]("energy_share"))
    assert(shares.forall(sh => sh >= 0.0 && sh <= 1.0))
    assert(fracs.head <= 1.0 + 1e-9 &&
      fracs.head >= approx.getAs[Double]("energy_share") - 1e-9)
    // rounding aside, the report fraction is the sum of the emitted shares
    assert(math.abs(fracs.head - shares.sum) < 1e-4,
      s"kept fraction ${fracs.head} != sum of shares ${shares.sum}")

    // detail ranks are ordered by |coef| with the declared tie-break
    val details = rows.filter(_.getAs[String]("kind") == "detail")
      .sortBy(_.getAs[Long]("rank"))
    val mags = details.map(r => math.abs(r.getAs[Long]("coef")))
    assert(mags.zip(mags.tail).forall { case (a, b) => a >= b },
      s"details not |coef|-descending: ${mags.mkString(",")}")
  }
}
