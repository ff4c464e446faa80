package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the pretraining-prep wave (q266–q269): span
  * accounting identities, ROUGE bounds and the self-overlap law,
  * greedy-hit-rate bounds, and curriculum monotonicity.
  */
class PretrainOpsSpec extends SparkTestBase {

  test("span corruption: accounting identities hold, ratio near the density") {
    val rows = PretrainOps.q266SpanCorruption.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val m = r.getAs[Long]("n_masked")
      val sp = r.getAs[Long]("n_spans")
      assert(m <= n)
      assert(sp <= m, "more spans than masked tokens")
      assert((m == 0) == (sp == 0))
      assert(math.abs(r.getAs[Double]("mask_ratio") - m.toDouble / n) < 1e-6)
    }
    val totalMask = rows.map(_.getAs[Long]("n_masked")).sum.toDouble
    val totalTok = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    assert(math.abs(totalMask / totalTok - 0.15) < 0.02,
      s"corpus mask rate ${totalMask / totalTok} far from 0.15")
  }

  test("ROUGE: recalls in [0,1]; a doc scored against itself is exactly 1") {
    val rows = PretrainOps.q267RougeNeighbors.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r1 = r.getAs[Double]("rouge1_recall")
      val r2 = r.getAs[Double]("rouge2_recall")
      assert(r1 >= 0 && r1 <= 1.0, s"rouge1 $r1")
      assert(r2 >= 0 && r2 <= 1.0, s"rouge2 $r2")
    }
    // pair each doc with itself through the same overlap math → 1.0
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1).limit(5).collect()
    docs.foreach { d =>
      val toks = d.getAs[scala.collection.Seq[String]]("toks").toSeq
      val counts = toks.groupBy(identity).map { case (k, v) => k -> v.size }
      val ov = counts.values.sum // min(c,c) summed = total
      assert(ov == toks.size)
    }
  }

  test("greedy hit rate: bounded, and the corpus argmax beats uniform guessing") {
    val rows = PretrainOps.q268BigramHitRate.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hr = r.getAs[Double]("hit_rate")
      assert(hr >= 0 && hr <= 1.0)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_transitions"))
    }
    val hits = rows.map(_.getAs[Long]("n_hits")).sum.toDouble
    val trans = rows.map(_.getAs[Long]("n_transitions")).sum.toDouble
    // trained-on-corpus greedy must beat 1/|vocab| by a wide margin
    assert(hits / trans > 0.01, s"corpus hit rate ${hits / trans} implausibly low")
  }

  test("curriculum: 8 shards, difficulty bands monotone and non-overlapping") {
    val rows = PretrainOps.q269CurriculumShards.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("shard"))
    assert(rows.map(_.getAs[Long]("shard")).toSeq == (1L to 8L))
    rows.foreach { r =>
      assert(r.getAs[Double]("min_nll") <= r.getAs[Double]("mean_nll"))
      assert(r.getAs[Double]("mean_nll") <= r.getAs[Double]("max_nll"))
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("max_nll") <= b.getAs[Double]("min_nll") + 1e-9,
        s"shards ${a.getAs[Long]("shard")} and ${b.getAs[Long]("shard")} overlap")
    }
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1, s"ntile sizes unbalanced: ${sizes.mkString(",")}")
  }
}
