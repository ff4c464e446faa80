package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the corpus-mining wave (q339–q341). Exactness is
  * the DuckDB oracle's job; these assert what it can't express: span
  * containment consistency against brute force, gradient-descent
  * progress, and the semi-hard band contract.
  */
class MineOpsSpec extends SparkTestBase {

  test("q339: coverage bounded, span ladder consistent, and dup8 matches brute force at sf0.001") {
    val rows = MineOps.q339DuplicateSpans.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_toks"); val cov = r.getAs[Long]("covered_toks")
      val nd = r.getAs[Long]("n_dup8"); val mk = r.getAs[Long]("max_dup_k")
      assert(cov <= n, s"coverage $cov exceeds tokens $n")
      assert((nd > 0) == (cov > 0) && (nd > 0) == (mk >= 8))
      if (nd > 0) assert(cov >= 8, "a duplicated 8-gram covers at least 8 tokens")
      // a shared 32-span contains shared 16- and 8-spans by construction
      assert(Set(0L, 8L, 16L, 32L).contains(mk))
    }
    assert(rows.exists(_.getAs[Long]("max_dup_k") > 0), "no duplicated spans in fixture")
    assert(rows.exists(_.getAs[Long]("max_dup_k") == 0), "every doc duplicated — no selectivity")
    // brute force the 8-gram layer
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).filter(_._2.length >= 8)
    val gramDocs = scala.collection.mutable.HashMap[String, scala.collection.mutable.Set[Long]]()
    docs.foreach { case (id, t) =>
      t.sliding(8).foreach(g => gramDocs.getOrElseUpdate(g.mkString(" "),
        scala.collection.mutable.Set.empty) += id)
    }
    val expected = docs.map { case (id, t) =>
      id -> t.sliding(8).count(g => (gramDocs(g.mkString(" ")) - id).nonEmpty)
    }.toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_dup8") == expected(id),
        s"doc $id: n_dup8 ${r.getAs[Long]("n_dup8")} vs brute ${expected(id)}")
    }
  }

  test("q340: GD makes progress — log-loss strictly decreases and weights move") {
    val rows = MineOps.q340LogregQuality.fn(spark, "/root/testdata/sf0.01")
      .orderBy(col("iter")).collect()
    assert(rows.length == 3)
    val losses = rows.map(_.getAs[Double]("logloss"))
    assert(losses(0) > losses(1) && losses(1) > losses(2),
      s"log-loss not decreasing: ${losses.toSeq}")
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc > 0.0 && acc <= 1.0)
    }
    // iteration 0 starts at the zero vector, its update is nonzero
    assert(rows(0).getAs[Double]("w0") == 0.0 && rows(0).getAs[Double]("nw0") != 0.0)
    // the chain is consistent: each row's updated weights are the next row's
    for (i <- 0 until 2; j <- 0 until 4)
      assert(rows(i).getAs[Double](s"nw$j") == rows(i + 1).getAs[Double](s"w$j"))
  }

  test("q341: negatives sit strictly inside the semi-hard band with opposite labels") {
    val rows = MineOps.q341HardNegatives.fn(spark, sfDir).collect()
    assert(rows.nonEmpty, "no semi-hard negatives at sf0.001 — band never fires")
    val labels = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getAs[Long]("anchor_id")).foreach { case (a, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq, s"anchor $a ranks not dense")
      rs.foreach { r =>
        val m = r.getAs[Double]("margin")
        assert(m > 0.0 && m <= 0.15 + 1e-9, s"margin $m outside the band")
        assert(r.getAs[Double]("cos_neg") < r.getAs[Double]("cos_pos"))
        assert(labels(r.getAs[Long]("neg_id")) != labels(a),
          s"negative ${r.getAs[Long]("neg_id")} shares anchor $a's label")
      }
    }
  }
}
