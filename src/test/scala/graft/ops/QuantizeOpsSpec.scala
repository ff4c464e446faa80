package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the vector-quantization & search wave (q250–q253):
  * PQ code packing and error bounds, ADC ranking laws and agreement with
  * the exact search, b-bit estimator behavior on known-identical pairs,
  * and the Matryoshka audit's p=64 fixed point.
  */
class QuantizeOpsSpec extends SparkTestBase {

  test("PQ: one packed code per vector, codes in range, error beats the 1-centroid baseline") {
    val rows = QuantizeOps.q250ProductQuantization.fn(spark, sfDir).collect()
    val n = Tables(spark, sfDir).embeddings.count()
    assert(rows.length == n, s"${rows.length} codes for $n vectors")
    rows.foreach { r =>
      val code = r.getAs[Long]("pq_code")
      assert(code >= 0 && code < (1L << 32), s"packed code $code out of 8×4-bit range")
      assert(r.getAs[Double]("recon_err") >= 0)
    }
    // 16 centroids per subspace must beat collapsing the corpus to its mean
    val totalErr = rows.map(_.getAs[Double]("recon_err")).sum
    val varAroundMean = Tables(spark, sfDir).embeddings
      .select(posexplode(col("embedding")))
      .select(col("pos"), col("col").cast("double").as("v"))
      .groupBy(col("pos"))
      .agg((sum(col("v") * col("v")) - pow(sum(col("v")), 2) / count(lit(1))).as("ss"))
      .agg(sum(col("ss"))).head.getDouble(0)
    assert(totalErr < varAroundMean,
      s"PQ error $totalErr worse than the zero-information baseline $varAroundMean")
  }

  test("ADC: dense ranks per query, distances non-decreasing, overlaps the exact search") {
    val rows = QuantizeOps.q251PqAdcTopk.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
                 r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist")))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to 5L), s"query $q ranks ${sorted.map(_._2).toSeq}")
      assert(sorted.sliding(2).forall(p => p(0)._4 <= p(1)._4),
        s"query $q ADC distances not sorted")
      assert(g.forall(_._3 != q), "query returned as its own neighbor")
    }
    // the compressed search must clearly beat random agreement with the
    // exact search: with |corpus| = 500 a random pick lands in the exact
    // top-50 10% of the time (E[hits] = 0.5/query) — require ≥ 1 per
    // query and ≥ 5 of 15 overall
    val emb = Tables(spark, sfDir).embeddings.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray).toMap
    val hitsPerQ = byQ.map { case (q, g) =>
      val qv = emb(q)
      val exact = emb.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          id -> v.zip(qv).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
        }.sortBy { case (id, d) => (d, id) }.take(50).map(_._1).toSet
      val hits = g.map(_._3).count(exact)
      assert(hits >= 1, s"query $q: no ADC pick in the exact top-50")
      hits
    }
    assert(hitsPerQ.sum >= 5, s"only ${hitsPerQ.sum} of 15 ADC picks in exact top-50")
  }

  test("b-bit minhash: estimator bounded, twins collide fully, error tracks the promise") {
    val rows = QuantizeOps.q252BbitMinhash.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Double]("jac_true"), r.getAs[Long]("n_collisions"),
                 r.getAs[Double]("jac_bbit"), r.getAs[Double]("abs_err")))
    assert(rows.nonEmpty, "no candidate pairs above jac_true 0.2 — fixture lost its near-dups")
    rows.foreach { case (jt, c, jb, err) =>
      assert(c >= 0 && c <= 64)
      assert(jb <= 1.0 + 1e-9)
      assert(math.abs(err - math.abs(jb - jt)) < 1e-5)
      if (jt >= 0.999) assert(c == 64 && jb >= 0.999, s"exact twin estimated at $jb")
    }
    // k=64, b=2 ⇒ sd of the estimator ≤ ~1/(0.75·√64) ≈ 0.17; the mean
    // error across pairs should sit well inside that
    val meanErr = rows.map(_._4).sum / rows.length
    assert(meanErr < 0.17, s"mean |err| $meanErr exceeds the b-bit variance promise")
  }

  test("Matryoshka: p=64 is the fixed point, recalls valid, coverage complete") {
    val rows = QuantizeOps.q253MatryoshkaRecall.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("prefix_dim"), r.getAs[Long]("query_id"),
                 r.getAs[Double]("recall")))
    assert(rows.length == 4 * 5, s"expected 20 (prefix, query) rows, got ${rows.length}")
    rows.foreach { case (p, q, rec) =>
      assert(rec >= 0.0 && rec <= 1.0)
      if (p == 64) assert(rec == 1.0, s"query $q: full-dim recall $rec != 1")
    }
    val mean8 = rows.filter(_._1 == 8).map(_._3).sum / 5
    val mean32 = rows.filter(_._1 == 32).map(_._3).sum / 5
    assert(mean32 >= mean8 - 0.2,
      s"mean recall collapsed with MORE dims: p32 $mean32 vs p8 $mean8")
  }
}
