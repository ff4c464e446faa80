package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the range-planner wave (q428): boundary replay,
  * partition contiguity/conservation, and the balance guarantee (no
  * range partition exceeds N/P by more than one key's worth of rows).
  */
class PartitionPlanOpsSpec extends SparkTestBase {

  test("q428: boundary replay, contiguity, conservation, balance") {
    val rows = PartitionPlanOps.q428RangePlanner.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("part"))
    val total = Tables(spark, sfDir).lineitem.count()
    assert(rows.map(_.getAs[Long]("n_range")).sum == total)
    assert(rows.map(_.getAs[Long]("n_hash")).sum == total)
    // contiguous, disjoint key ranges
    rows.sliding(2).foreach { w =>
      if (w.length == 2 && !w(1).isNullAt(w(1).fieldIndex("lo")))
        assert(w(1).getAs[Long]("lo") > w(0).getAs[Long]("hi"))
    }

    val keys = Tables(spark, sfDir).lineitem
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = keys.map(_._2).sum
    val p = 16
    var cum = 0L
    val bounds = keys.flatMap { case (k, cnt) =>
      val fprev = math.floor(cum.toDouble * p / n).toLong
      cum += cnt
      val fcur = math.floor(cum.toDouble * p / n).toLong
      if (fcur > fprev && fprev < p - 1) Some(k) else None
    }
    assert(bounds.length == rows.length - 1)
    // every reported hi except the last is a boundary key
    assert(rows.dropRight(1).map(_.getAs[Long]("hi")).toSeq == bounds.toSeq)
    // balance: a range partition never exceeds ceil(N/P) + (max key run - 1)
    val maxRun = keys.map(_._2).max
    val cap = (n + p - 1) / p + maxRun
    rows.foreach(r => assert(r.getAs[Long]("n_range") <= cap,
      s"partition ${r.getAs[Long]("part")} too heavy"))
    assert(rows.head.getAs[Double]("skew_range") <=
      rows.head.getAs[Double]("skew_hash") + 0.5,
      "range planning should not be wildly worse than hashing here")
  }
}
