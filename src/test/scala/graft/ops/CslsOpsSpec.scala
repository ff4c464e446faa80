package graft.ops

import graft.SparkTestBase

/** q489 semantics: the emitted CSLS top-5 replays the full Conneau-2018
  * definition — cosines, both hub penalties, re-ranking — computed
  * independently in plain Scala over the collected embeddings. */
class CslsOpsSpec extends SparkTestBase {

  test("q489: CSLS rerank == literal replay; movement is real on the fixture") {
    val emb = Tables(spark, sfDir).embeddings.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      .toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      // the engine's sequential-fold convention, replayed literally
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
      i = 0; while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
      i = 0; while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val queryIds = emb.keys.filter(_ < 8).toSeq.sorted
    val pairs = for {
      q <- queryIds; (x, v) <- emb if x != q
    } yield (q, x, cos(emb(q), v))
    def topMean(xs: Seq[Double], k: Int): Double =
      xs.sortBy(-_).take(k).sum / k
    val rx = pairs.groupBy(_._2).map { case (x, ps) =>
      x -> topMean(ps.map(_._3).toSeq, 4) }
    val rq = pairs.groupBy(_._1).map { case (q, ps) =>
      q -> topMean(ps.map(_._3).toSeq, 10) }
    val expected = pairs
      .map { case (q, x, c) => (q, x, c, 2.0 * c - rx(x) - rq(q)) }
      .groupBy(_._1)
      .flatMap { case (q, ps) =>
        ps.sortBy(p => (-p._4, p._2)).take(5).zipWithIndex
          .map { case ((_, x, _, csls), ix) => (q, ix + 1L) -> (x, csls) }
      }

    val rows = CslsOps.q489CslsRerank.fn(spark, sfDir).collect()
    assert(rows.length == queryIds.size * 5, "top-5 per query")
    rows.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("csls_rank"))
      val (x, csls) = expected(key)
      assert(r.getAs[Long]("neighbor_id") == x, s"$key: wrong neighbor")
      assert(math.abs(r.getAs[Double]("csls") - csls) < 1e-12,
        s"$key: csls score drifted")
      assert(r.getAs[Long]("rank_moved") ==
        r.getAs[Long]("cos_rank") - r.getAs[Long]("csls_rank"))
    }
    assert(rows.exists(_.getAs[Long]("rank_moved") != 0L),
      "no hubness correction on the fixture — the rerank is vacuous")
  }
}
