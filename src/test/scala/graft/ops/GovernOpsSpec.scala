package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the governance & storage-planning wave
  * (q345–q347): lattice monotonicity, ablation arithmetic against brute
  * force, and compression-cost sanity.
  */
class GovernOpsSpec extends SparkTestBase {

  test("q345: k-anonymity is monotone up the lattice, corners behave, at most one best") {
    val dir = "/root/testdata/sf0.01"
    val rows = GovernOps.q345KanonLattice.fn(spark, dir).collect()
    assert(rows.length == 27)
    val byNode = rows.map(r => (r.getAs[Long]("l_nation"), r.getAs[Long]("l_year"),
      r.getAs[Long]("l_price")) -> r).toMap
    // the fully-suppressed corner is one class holding every row
    val top = byNode((2L, 2L, 2L))
    assert(top.getAs[Long]("n_classes") == 1 && top.getAs[Boolean]("meets_k10"))
    // generalizing any one QI never increases the class count and never
    // breaks k-anonymity once met (monotonicity — the Incognito pruning law)
    for (((a, b, c), r) <- byNode; d <- 0 until 3) {
      val up = d match {
        case 0 => (a + 1, b, c); case 1 => (a, b + 1, c); case _ => (a, b, c + 1)
      }
      byNode.get(up).foreach { u =>
        assert(u.getAs[Long]("n_classes") <= r.getAs[Long]("n_classes"),
          s"classes rose generalizing $d from ($a,$b,$c)")
        if (r.getAs[Boolean]("meets_k10"))
          assert(u.getAs[Boolean]("meets_k10"),
            s"k-anonymity lost generalizing $d from ($a,$b,$c)")
      }
    }
    val best = rows.filter(_.getAs[Boolean]("is_best"))
    assert(best.length == 1 && best.head.getAs[Boolean]("meets_k10"))
    assert(rows.exists(!_.getAs[Boolean]("meets_k10")),
      "every node meets k — the lattice discriminates nothing at this fixture")
  }

  test("q346: leave-one-out means match a brute-force recompute per source") {
    val dir = sfDir
    val rows = GovernOps.q346LosoAblation.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val docs = Tables(spark, dir).documents
      .select(col("source"), col("text")).collect()
      .map { r =>
        val toks = "\\w+".r.findAllIn(r.getString(1).toLowerCase).toSeq
        (r.getString(0), toks)
      }.filter(_._2.nonEmpty)
      .map { case (src, toks) =>
        val score = BigDecimal(toks.distinct.size.toDouble / toks.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        (src, score, if (toks.size >= 20 && toks.size <= 400) 1L else 0L)
      }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val rest = docs.filterNot(_._1 == src)
      val brute = (rest.map(_._2).sum / rest.size).toDouble
      val got = r.getAs[Double]("mean_loso")
      assert(math.abs(got - brute) < 1e-8, s"$src: loso $got vs brute $brute")
    }
    val ranks = rows.map(_.getAs[Long]("influence_rank")).sorted
    assert(ranks.toSeq == (1L to rows.length).toSeq)
  }

  test("q347: cost formulas are sane and best is the argmin under the tie order") {
    val rows = GovernOps.q347PostingCompression.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables(spark, sfDir).documents.count()
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      val bm = r.getAs[Long]("bitmap_bits"); val ef = r.getAs[Long]("ef_bits")
      val vi = r.getAs[Long]("varint_bits")
      assert(bm == nDocs)
      assert(vi >= 8 * df, "varint under one byte per posting")
      assert(ef >= 2 * df, "EF under its 2-bit floor")
      val expected = if (ef <= vi && ef <= bm) "ef"
        else if (vi <= bm) "varint" else "bitmap"
      assert(r.getAs[String]("best") == expected)
    }
    // the classic outcome: dense terms prefer bitmap/EF over varint
    val kinds = rows.map(_.getAs[String]("best")).toSet
    assert(kinds.size >= 2, s"only one winning layout ($kinds) — fixture degenerate")
  }
}
