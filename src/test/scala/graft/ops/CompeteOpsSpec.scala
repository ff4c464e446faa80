package graft.ops

import graft.SparkTestBase

/** Semantic laws for the agreement & competition wave (q310–q313):
  * alpha recomputation, permutation-test accounting, Bradley–Terry
  * normalization/ordering, and tournament bounds.
  */
class CompeteOpsSpec extends SparkTestBase {

  test("krippendorff: alpha bounded and recomputes from the pass-count histogram") {
    val r = CompeteOps.q310KrippendorffAlpha.fn(spark, sfDir).collect()(0)
    val (n0, n1, alpha) = (r.getAs[Long]("n0"), r.getAs[Long]("n1"),
      r.getAs[Double]("alpha"))
    assert(n0 + n1 == 3 * r.getAs[Long]("n_units"))
    assert(alpha >= -1.0 && alpha <= 1.0)
    // independent recomputation from the per-document pass counts
    import org.apache.spark.sql.functions._
    val hist = Tables(spark, sfDir).documents
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"), col("n_chars"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("np",
        (col("n_toks") >= 30L).cast("long") +
        (col("n_toks") > 0L && size(array_distinct(col("toks"))).cast("double") /
          greatest(col("n_toks"), lit(1L)) >= 0.25).cast("long") +
        (col("n_chars") >= 150L).cast("long"))
      .groupBy(col("np")).count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val o01x2 = hist.map { case (np, c) => np * (3 - np) * c }.sum
    val n1c = hist.map { case (np, c) => np * c }.sum
    val n0c = hist.map { case (np, c) => (3 - np) * c }.sum
    val expected = 1.0 - ((n0c + n1c - 1).toDouble * (o01x2 / 2.0)) / (n0c.toDouble * n1c)
    assert(math.abs(alpha - expected) < 1e-6)
  }

  test("paired permutation: accounting consistent, decision matches p-value") {
    val r = CompeteOps.q311PairedPermutation.fn(spark, sfDir).collect()(0)
    val (ne, nr, p) = (r.getAs[Long]("n_extreme"), r.getAs[Long]("n_reps"),
      r.getAs[Double]("p_value"))
    assert(nr == 64L && ne >= 0 && ne <= nr)
    assert(math.abs(p - ne.toDouble / nr) < 1e-9)
    assert(r.getAs[Boolean]("reject_05") == (p < 0.05))
    assert(r.getAs[Double]("t_obs_abs") >= 0)
  }

  test("bradley-terry: strengths normalize to mean 1 and follow win rates at the extremes") {
    val rows = CompeteOps.q312BradleyTerry.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("brand"), r.getAs[Long]("wins"),
        r.getAs[Long]("comparisons"), r.getAs[Double]("strength"),
        r.getAs[Long]("rank")))
    assert(rows.nonEmpty)
    assert(rows.map(_._5).sorted.toSeq == (1L to rows.length))
    assert(math.abs(rows.map(_._4).sum / rows.length - 1.0) < 1e-3)
    val byRank = rows.sortBy(_._5)
    val top = byRank.head; val bottom = byRank.last
    assert(top._2.toDouble / top._3 >= bottom._2.toDouble / bottom._3,
      "top strength has a lower win rate than bottom")
  }

  test("condorcet: scores bounded, full round-robin, at most one winner") {
    val rows = CompeteOps.q313CondorcetAudit.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("brand"), r.getAs[Long]("copeland"),
        r.getAs[Long]("n_opponents"), r.getAs[Boolean]("is_condorcet")))
    assert(rows.nonEmpty)
    val n = rows.length
    rows.foreach { case (_, cop, opp, _) =>
      assert(cop >= 0 && cop <= opp)
      assert(opp == n - 1, "round-robin incomplete")
    }
    assert(rows.count(_._4) <= 1, "two Condorcet winners")
  }
}
