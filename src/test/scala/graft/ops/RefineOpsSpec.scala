package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the corpus-refinement wave (q226–q229). Exactness
  * is the DuckDB oracle's job; these assert the invariants the oracle
  * can't express: rule/flag consistency, SemDeDup witness existence and
  * completeness against a brute-force rescore, the k-core upper-bound
  * property against a run-to-fixpoint peel, and IPF marginal convergence.
  */
class RefineOpsSpec extends SparkTestBase {

  test("gopher gate: passed is exactly the conjunction, and every rule discriminates at sf0.01") {
    val rows = RefineOps.q226GopherRules.fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = r.getAs[Boolean]("r_len") && r.getAs[Boolean]("r_wlen") &&
        r.getAs[Boolean]("r_stop") && r.getAs[Boolean]("r_ttr")
      assert(r.getAs[Boolean]("passed") == expect, s"flag mismatch at ${r.getAs[Long]("doc_id")}")
    }
    for (rule <- Seq("r_len", "r_wlen", "r_stop", "r_ttr")) {
      val f = rows.count(_.getAs[Boolean](rule) == false)
      assert(f > 0 && f < rows.length, s"$rule passes or fails everything — no selectivity")
    }
  }

  test("semdedup: dropped vectors have a smaller-id cellmate >= tau; kept vectors have none") {
    val dir = sfDir
    val out = RefineOps.q227Semdedup.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Boolean]("kept")))
    val cellOf = out.map(r => r._1 -> r._2).toMap
    val vecs = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long](0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val tau = 0.35
    out.foreach { case (id, cell, kept) =>
      val shadow = vecs.keys.exists(o =>
        o < id && cellOf(o) == cell && cos(vecs(o), vecs(id)) >= tau)
      assert(shadow == !kept, s"vec $id kept=$kept but brute-force shadow=$shadow")
    }
    assert(out.exists(!_._3), "no vector dropped at this tau — gate is inert")
  }

  test("semdedup: literal and broadcast-join cell paths agree exactly, at fixture and scaled seed counts") {
    // the gated fixtures run the <=64-seed literal path; the join path is
    // what a 100 TB corpus runs. Prove identical assignment for both the
    // fixture's seed count and a larger one that only the join path serves.
    for (nSeeds <- Seq(RefineOps.semdedupSeeds(500), 80)) {
      val lit = RefineOps.semdedupCells(spark, sfDir, nSeeds, forceJoinPath = false)
        .select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
      val join = RefineOps.semdedupCells(spark, sfDir, nSeeds, forceJoinPath = true)
        .select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
      assert(lit.size == join.size && lit.size == 500)
      lit.foreach { case (id, c) =>
        assert(join(id) == c, s"vec $id: literal cell $c vs join cell ${join(id)} at nSeeds=$nSeeds")
      }
    }
  }

  test("semdedup: seed count scales with the corpus and occupancy stays within the skew bound") {
    assert(RefineOps.semdedupSeeds(500) == 8)     // fixture floor
    assert(RefineOps.semdedupSeeds(2000) == 16)   // sf0.1 already scales
    assert(RefineOps.semdedupSeeds(200000) == 1563) // the sf10 grid
    // nearest-seed assignment is not perfectly balanced; the quadratic
    // stage budget assumes occupancy = O(targetCellSize). Pin the skew
    // factor the fixture exhibits so a regression (all mass in one cell)
    // fails loudly rather than silently reintroducing N² work.
    val nVec = 500L
    val occ = RefineOps.semdedupCells(spark, sfDir, RefineOps.semdedupSeeds(nVec))
      .groupBy(col("cell")).count().collect().map(_.getLong(1))
    val expected = nVec.toDouble / RefineOps.semdedupSeeds(nVec)
    assert(occ.max <= (4 * expected).ceil.toLong,
      s"max cell ${occ.max} exceeds 4x expected occupancy $expected")
    assert(occ.length == RefineOps.semdedupSeeds(nVec), "empty cells at the fixture seed count")
  }

  test("k-core: 4-round peel is an upper bound containing the true 3-core, tight when converged") {
    val out = RefineOps.q228Kcore.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Boolean]("survived"))).toMap
    // brute-force: rebuild the support-2 co-purchase graph and peel to fixpoint
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val support = scala.collection.mutable.HashMap[(Long, Long), Int]()
    byOrder.foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        support((parts(i), parts(j))) = support.getOrElse((parts(i), parts(j)), 0) + 1
    }
    val edges = support.filter(_._2 >= 2).keys.toSeq
    var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var stable = false
    while (!stable) {
      val deg = edges.filter(e => alive(e._1) && alive(e._2))
        .flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, x) => n -> x.size }
      val next = alive.filter(n => deg.getOrElse(n, 0) >= 3)
      stable = next == alive
      alive = next
    }
    // every true 3-core member must survive the 4-round upper bound
    alive.foreach(n => assert(out(n), s"true 3-core member $n was peeled"))
    assert(out.nonEmpty && alive.nonEmpty, "degenerate graph at sf0.001")
  }

  test("IPF raking: lang marginals land within 2% of uniform, source marginals within 2% of observed") {
    val dir = "/root/testdata/sf0.01"
    val rows = RefineOps.q229IpfRaking.fn(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
                 r.getAs[Long]("n"), r.getAs[Double]("weight")))
    val total = rows.map(_._3).sum.toDouble
    val nLangs = rows.map(_._1).distinct.length
    val langTarget = total / nLangs
    // after the final column pass, row sums are one half-step off target;
    // 2% is the convergence bar two full iterations must clear on this mix
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val got = cells.map(_._4).sum
      assert(math.abs(got - langTarget) / langTarget < 0.02,
        s"$lang marginal $got vs target $langTarget")
    }
    rows.groupBy(_._2).foreach { case (src, cells) =>
      val observed = cells.map(_._3).sum.toDouble
      val got = cells.map(_._4).sum
      assert(math.abs(got - observed) / observed < 0.02,
        s"$src marginal $got vs observed $observed")
    }
    assert(rows.forall(_._4 > 0), "non-positive rake weight")
  }
}
