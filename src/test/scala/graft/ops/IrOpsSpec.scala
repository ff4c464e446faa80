package graft.ops

import graft.SparkTestBase

/** Semantic laws for the IR-systems wave (q318–q321): intersection
  * monotonicity and ordering dominance, WAND soundness, cascade recall
  * monotonicity, and PRF query-shape invariants.
  */
class IrOpsSpec extends SparkTestBase {

  test("boolean retrieval: candidates shrink per step, rarest-first dominates") {
    val rows = IrOps.q318BooleanRetrieval.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("ordering"), r.getAs[Long]("step")) ->
        r.getAs[Long]("candidates")).toMap
    assert(rows.size == 6)
    Seq("rarest_first", "commonest_first").foreach { o =>
      assert(rows((o, 1L)) >= rows((o, 2L)), s"$o grew at step 2")
    }
    assert(rows(("rarest_first", 2L)) >= rows(("rarest_first", 3L)))
    // same final AND set regardless of order
    assert(rows(("rarest_first", 3L)) == rows(("commonest_first", 3L)))
    // the ordering heuristic: starting from the rarest list never does
    // more step-1 work than starting from the commonest
    assert(rows(("rarest_first", 1L)) <= rows(("commonest_first", 1L)))
  }

  test("wand: threshold positive, pruning is sound (never prunes a top-10 doc)") {
    val r = IrOps.q319WandPruning.fn(spark, sfDir).collect()(0)
    val (theta, n, np, share) = (r.getAs[Double]("theta"),
      r.getAs[Long]("n_scored_docs"), r.getAs[Long]("n_prunable"),
      r.getAs[Double]("prunable_share"))
    assert(theta > 0 && n >= 10)
    assert(np >= 0 && np <= n - 10,
      "pruned more docs than the non-top-10 universe — a top-10 doc was pruned")
    assert(math.abs(share - np.toDouble / n) < 1e-6)
  }

  test("cascade: recall@10 is monotone in the candidate budget and hits 1.0 eventually") {
    val rows = IrOps.q320CascadeRecall.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("budget"), r.getAs[Double]("recall_at_10")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(25L, 50L, 100L))
    rows.foreach { case (_, rec) => assert(rec >= 0 && rec <= 1.0) }
    assert(rows.sliding(2).forall { case Array(a, b) => b._2 >= a._2 - 1e-9 },
      "recall fell as the budget grew")
  }

  test("rocchio: 3 originals + 3 expansions, disjoint, every term occurs somewhere") {
    val rows = IrOps.q321RocchioPrf.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[String]("provenance"),
        r.getAs[Long]("df")))
    assert(rows.count(_._2 == "original") == 3)
    assert(rows.count(_._2 == "expanded") == 3)
    val orig = rows.filter(_._2 == "original").map(_._1).toSet
    val exp = rows.filter(_._2 == "expanded").map(_._1).toSet
    assert(orig == Set("spark", "join", "window"))
    assert((orig & exp).isEmpty, "an expansion term duplicates the query")
    rows.foreach { case (t, _, df) => assert(df > 0, s"term $t has no postings") }
  }
}
