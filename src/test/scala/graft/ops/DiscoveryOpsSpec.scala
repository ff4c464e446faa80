package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the discovery & weak-supervision wave
  * (q270–q273): known-true FDs surface, hashing accounting laws, MI
  * symmetry-free bounds, and the label model beating its noisiest
  * labeler.
  */
class DiscoveryOpsSpec extends SparkTestBase {

  test("FD discovery: nation→region holds exactly, reverse does not, shares valid") {
    val rows = DiscoveryOps.q270FdDiscovery.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) ->
        (r.getAs[Double]("violation_share"), r.getAs[Boolean]("holds"))).toMap
    assert(rows.size == 20, s"expected 20 ordered pairs, got ${rows.size}")
    // the schema guarantees nation → region
    assert(rows(("nation", "region"))._2, "nation→region should hold")
    assert(rows(("nation", "region"))._1 == 0.0)
    // a region has many nations
    assert(!rows(("region", "nation"))._2, "region→nation cannot hold")
    rows.values.foreach { case (share, holds) =>
      assert(share >= 0 && share <= 1)
      assert(holds == (share == 0.0))
    }
  }

  test("feature hashing: conservation laws and a plausible Poisson load") {
    val r = DiscoveryOps.q271FeatureHashAudit.fn(spark, sfDir).collect()(0)
    val used = r.getAs[Long]("n_buckets_used")
    val vocab = r.getAs[Long]("vocab_size")
    assert(used <= 1024 && used <= vocab)
    assert(r.getAs[Long]("collision_mass") <= r.getAs[Long]("total_occ"))
    assert(r.getAs[Long]("max_bucket_tokens") >= (vocab + 1023) / 1024,
      "max bucket below the pigeonhole floor")
    val trueVocab = Tables(spark, sfDir).documents
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head.getLong(0)
    assert(vocab == trueVocab)
  }

  test("MI matrix: non-negative, normalized in [0,1], independent-ish year pairs near 0") {
    val rows = DiscoveryOps.q272MiMatrix.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b"),
        r.getAs[Double]("mi_nats"), r.getAs[Double]("mi_normalized")))
    assert(rows.length == 6)
    rows.foreach { case (a, b, mi, nmi) =>
      assert(mi >= -1e-6, s"$a×$b: negative MI $mi")
      assert(nmi >= -1e-6 && nmi <= 1.0 + 1e-6, s"$a×$b: normalized MI $nmi")
    }
    // md5-derived segments and order years are independent by construction
    val yearSeg = rows.find(r => Set(r._1, r._2) == Set("segment", "o_year")).get
    assert(yearSeg._4 < 0.05, s"segment×year nMI ${yearSeg._4} should be ≈ 0")
  }

  test("label model: accuracy-weighted relabel beats the noisiest labeler alone") {
    val rows = DiscoveryOps.q273DawidSkene.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val correct = rows.map(_.getAs[Long]("n_correct")).sum
    val total = Tables(spark, sfDir).documents.count()
    assert(n == total, s"relabeled $n of $total docs")
    val acc = correct.toDouble / n
    // the worst LF alone is right 60% of the time; majority + weighting
    // must clear it decisively
    assert(acc > 0.8, s"label-model accuracy $acc not above the noisy floor")
    rows.foreach { r =>
      assert(r.getAs[Double]("precision") >= 0 && r.getAs[Double]("precision") <= 1)
    }
  }
}
