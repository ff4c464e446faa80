package graft.ops

import graft.SparkTestBase

/** Semantic laws for the storage-layout wave (q302–q305): sorted-order
  * delta minimality, Bloom FPR vs theory, compaction accounting, and
  * tier ordering.
  */
class StorageOpsSpec extends SparkTestBase {

  test("delta layout: sorting on the delta key minimizes mean |delta|") {
    val rows = StorageOps.q302DeltaLayout.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("avg_abs_delta"),
          r.getAs[Long]("delta_bits"), r.getAs[Double]("rle_ratio")))
      .toMap
    assert(rows.keySet == Set("by_orderkey", "by_partkey"))
    assert(rows("by_orderkey")._1 == rows("by_partkey")._1)
    // within each day the key-sorted order's total |delta| is the key
    // range — no other order does better
    assert(rows("by_orderkey")._2 <= rows("by_partkey")._2 + 1e-9)
    rows.values.foreach { case (_, avg, bits, rle) =>
      assert(avg >= 0 && bits >= 1 && rle > 0 && rle <= 1)
    }
  }

  test("bloom sweep: empirical FPR tracks theory, more bits help") {
    val rows = StorageOps.q303BloomFprSweep.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("bits_per_key") ->
        (r.getAs[Double]("occupancy"), r.getAs[Double]("fpr_emp"),
          r.getAs[Double]("fpr_pred"), r.getAs[Long]("n_probes")))
      .toMap
    assert(rows.keySet == Set(8L, 16L))
    rows.foreach { case (_, (occ, emp, pred, n)) =>
      assert(occ > 0 && occ < 1)
      assert(emp >= 0 && emp <= 1 && pred > 0 && pred < 1)
      // binomial 5-sigma envelope around the prediction
      val sigma = math.sqrt(pred * (1 - pred) / n)
      assert(math.abs(emp - pred) < 5 * sigma + 1e-6,
        s"fpr_emp $emp vs pred $pred outside 5 sigma ($sigma) at n=$n")
    }
    assert(rows(16L)._2 <= rows(8L)._2, "16 bits/key did not beat 8")
  }

  test("compaction plan: bytes account exactly, bins bounded by files") {
    val rows = StorageOps.q304CompactionPlan.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var totalBytes = 0L
    rows.foreach { r =>
      val (nf, tb, nb, mx) = (r.getAs[Long]("n_files"), r.getAs[Long]("total_bytes"),
        r.getAs[Long]("n_bins"), r.getAs[Long]("max_bin_bytes"))
      assert(nb >= 1 && nb <= nf)
      assert(mx <= tb && r.getAs[Double]("mean_fill") > 0)
      totalBytes += tb
    }
    val liRows = Tables(spark, sfDir).lineitem.count()
    assert(totalBytes == liRows * 100L, "byte accounting lost rows")
  }

  test("hot/cold tiering: shares sum to 1, per-part train frequency orders the tiers") {
    val rows = StorageOps.q305HotColdTiering.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("tier") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("train_accesses"),
          r.getAs[Long]("eval_accesses"), r.getAs[Double]("eval_share")))
      .toMap
    assert(rows.keySet.subsetOf(Set("hot", "warm", "cold", "unseen")))
    assert(math.abs(rows.values.map(_._4).sum - 1.0) < 1e-4)
    // ranking guarantee: every hot part's train frequency >= every warm
    // part's >= every cold part's, so the per-part means order the same way
    def meanFreq(t: String) = rows.get(t)
      .map(v => v._2.toDouble / math.max(v._1, 1)).getOrElse(0.0)
    if (rows.contains("hot") && rows.contains("cold"))
      assert(meanFreq("hot") >= meanFreq("cold"))
    rows.get("unseen").foreach { case (_, train, _, _) => assert(train == 0) }
  }
}
