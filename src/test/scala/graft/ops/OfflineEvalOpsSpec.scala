package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the offline-evaluation wave (q361–q362): the DR
  * decomposition laws and a pairwise brute force of the rank-sum AUC.
  */
class OfflineEvalOpsSpec extends SparkTestBase {

  test("q361: DR = DM + correction, DM equals the model value of the target arm") {
    val rows = OfflineEvalOps.q361DrPolicyEval.fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    // recompute the model-half per-arm reward model independently
    val qhat = Tables(spark, "/root/testdata/sf0.01").events
      .select(col("event_id"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("r"))
      .filter(substring(md5(col("event_id").cast("string")), 1, 1)
        .isin("0", "1", "2", "3", "4", "5", "6", "7"))
      .groupBy(col("event_type")).agg(avg(col("r")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val (dm, corr, dr, ips) = (r.getAs[Double]("dm"),
        r.getAs[Double]("ips_correction"), r.getAs[Double]("dr"),
        r.getAs[Double]("ips"))
      // decomposition law on independently rounded components
      assert(math.abs(dm + corr - dr) < 2e-6, s"DR != DM + correction: $dm + $corr != $dr")
      // DM of an arm-level model is the model value of the target arm itself
      assert(math.abs(dm - qhat(r.getAs[String]("pi_a"))) < 2e-6,
        s"${r.getAs[String]("pi_a")}: dm $dm != model ${qhat(r.getAs[String]("pi_a"))}")
      assert(r.getAs[Long]("n_eval") > 0)
      assert(!ips.isNaN && !dr.isNaN)
    }
    // both halves estimate the same quantity: DR and IPS agree in aggregate
    // direction (weighted means within the reward scale, not divergent)
    val scale = qhat.values.max - qhat.values.min + 1.0
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("dr") - r.getAs[Double]("ips")) < 10 * scale,
        "DR and IPS wildly divergent — weighting broken")
    }
  }

  test("q362: rank-sum AUC equals the pairwise P(s+ > s-) + 0.5 P(tie) brute force") {
    val rows = OfflineEvalOps.q362RocAuc.fn(spark, sfDir).collect()
    assert(rows.length == 3)
    val data = Tables(spark, sfDir).orders
      .select(col("o_orderstatus"), col("o_totalprice"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    rows.foreach { r =>
      val st = r.getAs[String]("o_orderstatus")
      val pos = data.filter(d => d._1 == st && d._3 == 1).map(_._2)
      val neg = data.filter(d => d._1 == st && d._3 == 0).map(_._2)
      assert(r.getAs[Long]("n_pos") == pos.length.toLong)
      assert(r.getAs[Long]("n_neg") == neg.length.toLong)
      var num = 0.0
      for (p <- pos; n <- neg)
        num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
      val expAuc = num / (pos.length.toDouble * neg.length.toDouble)
      assert(math.abs(r.getAs[Double]("auc") - expAuc) < 1e-6,
        s"$st: auc ${r.getAs[Double]("auc")} != brute-forced $expAuc")
      // U statistic consistent with the same brute force
      assert(math.abs(r.getAs[Double]("u_stat") - num) < 1e-6)
      val auc = r.getAs[Double]("auc")
      assert(auc >= 0.0 && auc <= 1.0)
    }
  }
}
