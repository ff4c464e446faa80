package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the retrieval & selection wave (q230–q233):
  * greedy-MMR monotonicity, quantile-norm rank preservation, DSIR
  * target-domain separation, and the band-geometry nesting law.
  */
class RerankOpsSpec extends SparkTestBase {

  test("MMR: the 5 picks and scores equal a local brute-force greedy recomputation") {
    val rows = RerankOps.q230MmrRerank.fn(spark, sfDir)
      .orderBy(col("pick_rank")).collect()
    assert(rows.length == 5)
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == 5, "duplicate pick")
    // pick 1 has no diversity penalty and nb = 1 by construction
    assert(math.abs(rows.head.getAs[Double]("mmr_score") - 0.7) < 1e-9)
    // brute-force greedy replay: top-20 by bm25, then 5 λ=0.7 picks
    val bm = CurationOps.q91Bm25.fn(spark, sfDir)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25"))
    val maxBm = bm.map(_._2).max
    val nb = bm.map { case (id, b) => id -> b / maxBm }.toMap
    val vecs = Tables(spark, sfDir).embeddings
      .filter(col("vec_id").isin(bm.map(_._1): _*))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nbm = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nbm += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nbm))
    }
    var selected = Vector.empty[Long]
    val expect = (1 to 5).map { _ =>
      val (bestId, bestScore) = nb.keys.filterNot(selected.contains).toSeq.map { c =>
        val pen = if (selected.isEmpty) 0.0
        else selected.map(sid => cos(vecs(c), vecs(sid))).max
        c -> (0.7 * nb(c) - 0.3 * pen)
      }.minBy { case (id, sc) => (-sc, id) }
      selected :+= bestId
      (bestId, bestScore)
    }
    rows.zip(expect).foreach { case (r, (eid, esc)) =>
      assert(r.getAs[Long]("doc_id") == eid,
        s"pick ${r.getAs[Long]("pick_rank")}: got ${r.getAs[Long]("doc_id")}, brute force says $eid")
      assert(math.abs(r.getAs[Double]("mmr_score") - esc) < 1e-6)
    }
  }

  test("quantile norm: within each source the mapping preserves rank order, range matches global") {
    val rows = RerankOps.q231QuantileNorm.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("score"),
                 r.getAs[Double]("norm_score"), r.getAs[Long]("doc_id")))
    assert(rows.nonEmpty)
    val globalMin = rows.map(_._2).min
    val globalMax = rows.map(_._2).max
    rows.groupBy(_._1).foreach { case (_, g) =>
      val bySrc = g.sortBy(r => (r._2, r._4))
      bySrc.map(_._3).sliding(2).foreach {
        case Array(a, b) => assert(b >= a - 1e-9, "norm_score not monotone in source rank")
        case _ =>
      }
      // the lowest/highest doc per source maps to the global extremes
      assert(math.abs(bySrc.head._3 - globalMin) < 1e-6)
      assert(math.abs(bySrc.last._3 - globalMax) < 1e-6)
    }
  }

  test("DSIR: the English slice scores strictly higher on average than the rest") {
    val rows = RerankOps.q232DsirWeights.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Double]("avg_llr")))
    val (en, rest) = rows.partition(_._1 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val enMean = en.map(_._2).sum / en.length
    val restMean = rest.map(_._2).sum / rest.length
    assert(enMean > restMean,
      s"target-domain separation failed: en=$enMean rest=$restMean")
  }

  test("band tuning: coarser bands nest — candidates, hits, and recall are monotone in band count") {
    val rows = RerankOps.q233BandTuning.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("bands") ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_hit"), r.getAs[Double]("recall")))
      .toMap
    assert(rows.keySet == Set(16L, 8L, 4L))
    // agreement on a 4-row band implies agreement on both covering 2-row
    // bands: the candidate sets are nested, so every count is monotone
    assert(rows(16)._1 >= rows(8)._1 && rows(8)._1 >= rows(4)._1, s"candidates not nested: $rows")
    assert(rows(16)._2 >= rows(8)._2 && rows(8)._2 >= rows(4)._2, s"hits not nested: $rows")
    assert(rows(16)._3 >= rows(8)._3 && rows(8)._3 >= rows(4)._3, s"recall not monotone: $rows")
    assert(rows(16)._2 > 0, "16x2 finds no true pair — sweep is inert")
  }
}
