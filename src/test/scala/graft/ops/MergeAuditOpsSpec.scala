package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the sketch-mergeability wave (q387): the 1/32
  * rank-error theorem, the one-sided-underestimate property of the
  * step summary, and a brute-forced probe.
  */
class MergeAuditOpsSpec extends SparkTestBase {

  test("q387: merged ranks underestimate, stay within the 1/32 bound, and brute-force") {
    val rows = MergeAuditOps.q387ShardQuantileMerge.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Double]("q"))
    assert(rows.length == 5)
    rows.foreach { r =>
      // step summary takes the deepest boundary <= v: one-sided underestimate
      assert(r.getAs[Long]("merged_rank") <= r.getAs[Long]("true_rank"),
        s"q=${r.getAs[Double]("q")}: merged rank overestimates")
      // 4 shards x (n_s/32) per-shard slack = n/32 total
      assert(r.getAs[Double]("rel_rank_err") <= 1.0 / 32 + 1e-9,
        s"q=${r.getAs[Double]("q")}: error ${r.getAs[Double]("rel_rank_err")} breaks the 1/32 bound")
    }
    // brute-force the median probe
    val data = Tables(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_totalprice"),
        (conv(substring(md5(col("o_orderkey").cast("string")), 1, 2), 16, 10)
          .cast("long") % 4).as("shard"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val n = data.length
    val sortedAll = data.sortBy(t => (t._2, t._1))
    val med = rows.find(_.getAs[Double]("q") == 0.5).get
    val trueRank = math.ceil(0.5 * n).toInt
    assert(med.getAs[Long]("true_rank") == trueRank.toLong)
    val probeV = sortedAll(trueRank - 1)._2
    var merged = 0L
    data.groupBy(_._3).foreach { case (_, shardRows) =>
      val sv = shardRows.sortBy(t => (t._2, t._1))
      val ns = sv.length
      val cums = (1 to 32).map(j => math.ceil(j * ns / 32.0).toInt)
      // deepest boundary value <= probe
      val ok = cums.filter(c => sv(c - 1)._2 <= probeV)
      if (ok.nonEmpty) merged += ok.max
    }
    assert(med.getAs[Long]("merged_rank") == merged,
      s"median merged rank ${med.getAs[Long]("merged_rank")} != brute-forced $merged")
  }
}
