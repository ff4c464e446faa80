package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic laws for the post-training wave (q330–q333): pair margins,
  * best-of-n monotonicity and the n=1 mean identity, the incremental
  * dedup invariant, and packing accounting.
  */
class PrefOpsSpec extends SparkTestBase {

  test("preference pairs: positive margins, distinct sides, at most 3 per group") {
    val rows = PrefOps.q330PreferencePairs.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("margin") >= 0.05)
      assert(r.getAs[Long]("chosen_id") != r.getAs[Long]("rejected_id"))
      assert(r.getAs[Long]("pair_rank") >= 1 && r.getAs[Long]("pair_rank") <= 3)
    }
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
      .foreach { case (_, g) => assert(g.length <= 3) }
  }

  test("best-of-n: monotone in n, and n=1 is exactly the source mean") {
    val rows = PrefOps.q331BestOfN.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n"),
        r.getAs[Double]("expected_max")))
    rows.groupBy(_._1).foreach { case (src, g) =>
      val byN = g.sortBy(_._2)
      assert(byN.map(_._2).toSeq == Seq(1L, 2L, 4L, 8L))
      assert(byN.sliding(2).forall { case Array(a, b) => b._3 >= a._3 - 1e-9 },
        s"$src: E[max] fell as n grew")
    }
    val means = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .filter(col("n_toks") > 0)
      .withColumn("score",
        round(size(array_distinct(col("toks"))).cast("double") / col("n_toks"), 6))
      .groupBy(col("source")).agg(avg(col("score")).as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.filter(_._2 == 1L).foreach { case (src, _, e1) =>
      assert(math.abs(e1 - means(src)) < 1e-4,
        s"$src: E[max of 1] $e1 is not the mean ${means(src)}")
    }
  }

  test("incremental dedup: the batch update reconstructs the full pair set exactly") {
    val r = PrefOps.q332IncrementalDedup.fn(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_missing") == 0L, "incremental update missed pairs")
    assert(r.getAs[Long]("n_extra") == 0L, "incremental update invented pairs")
    assert(r.getAs[Long]("n_full") ==
      r.getAs[Long]("n_standing") + r.getAs[Long]("n_batch_touching"))
    assert(r.getAs[Long]("n_full") > 0, "no near-dup pairs — the invariant is vacuous")
  }

  test("multimodal packing: token accounting exact, fills sane") {
    val rows = PrefOps.q333MultimodalPacking.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var textTotal = 0L
    rows.foreach { r =>
      val fill = r.getAs[Double]("fill")
      assert(fill > 0 && fill <= 2.0)
      val share = r.getAs[Double]("image_share")
      assert(share >= 0 && share < 1)
      assert(r.getAs[Long]("n_seqs") <= r.getAs[Long]("n_docs"))
      textTotal += r.getAs[Long]("text_toks")
    }
    val expected = Tables(spark, sfDir).documents
      .select(size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0).agg(sum(col("n"))).collect()(0).getLong(0)
    assert(textTotal == expected, "text token mass lost in packing")
  }
}
