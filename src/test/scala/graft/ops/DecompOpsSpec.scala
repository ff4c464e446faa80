package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the mix/rate decomposition wave (q391): the two
  * effects reconstruct the independently-computed topline delta, and
  * shares are proper distributions.
  */
class DecompOpsSpec extends SparkTestBase {

  test("q391: effects sum to the topline delta; shares sum to one") {
    val rows = DecompOps.q391MixRateDecomp.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val share1 = rows.map(_.getAs[Double]("share1")).sum
    val share2 = rows.map(_.getAs[Double]("share2")).sum
    assert(math.abs(share1 - 1.0) < 1e-4 && math.abs(share2 - 1.0) < 1e-4)

    // independent topline: avg order value per era straight off orders
    val o = Tables(spark, sfDir).orders
      .withColumn("period",
        when(col("o_orderdate") < lit("1998-05-01").cast("timestamp"), 1)
          .otherwise(2))
      .groupBy(col("period"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avg_val"))
      .collect().map(r => r.getAs[Int]("period") -> r.getAs[Double]("avg_val"))
      .toMap
    val delta = o(2) - o(1)
    val effects = rows.map(r =>
      r.getAs[Double]("mix_effect") + r.getAs[Double]("rate_effect")).sum
    assert(math.abs(effects - delta) < 1e-3,
      s"decomposition $effects vs topline delta $delta")
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("delta_check") - delta) < 1e-3))
  }
}
