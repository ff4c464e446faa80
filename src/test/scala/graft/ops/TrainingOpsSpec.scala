package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the training-corpus operators (q80–q85). Exactness
  * is the DuckDB oracle's job; these assert the algebraic invariants the
  * oracle can't express (Lloyd objective monotonicity, funnel ordering,
  * packing conservation, gate separation, cap determinism).
  */
class TrainingOpsSpec extends SparkTestBase {

  test("kmeans: every vector assigned exactly once to a cluster in [0, k)") {
    val rows = TrainingOps.q80KmeansLloyd.fn(spark, sfDir).collect()
    val n = Tables(spark, sfDir).embeddings.count()
    assert(rows.length == n)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == n)
    assert(rows.forall { r =>
      val c = r.getAs[Long]("cluster"); c >= 0 && c < 8
    })
  }

  test("kmeans: two Lloyd rounds do not increase the clustering objective") {
    // Recompute the objective locally: SSE of each assignment against the
    // means its OWN clusters induce. Lloyd guarantees monotone descent.
    val vecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def sse(assign: Map[Long, Long]): Double = {
      val means = assign.groupBy(_._2).map { case (c, m) =>
        val vs = m.keys.map(vecs).toSeq
        c -> vs.transpose.map(col => col.sum / vs.length).toArray
      }
      assign.map { case (id, c) =>
        vecs(id).zip(means(c)).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    }
    // a0 = assignment against the seed centroids (first k vectors)
    val k = 8
    val seeds = (0L until k).map(i => i -> vecs(i)).toMap
    val a0 = vecs.map { case (id, v) =>
      id -> seeds.minBy { case (c, s) =>
        (v.zip(s).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }._1
    }
    val a2 = TrainingOps.q80KmeansLloyd.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    assert(sse(a2) <= sse(a0) + 1e-6, s"objective rose: ${sse(a0)} -> ${sse(a2)}")
  }

  test("funnel: strict view < click < purchase ordering in every row") {
    val rows = TrainingOps.q81EventFunnel.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, c, p) = (r.getAs[Long]("t_view_us"),
        r.getAs[Long]("t_click_us"), r.getAs[Long]("t_purchase_us"))
      assert(v < c && c < p, s"out-of-order funnel: $v $c $p")
    }
    // exactly the users who have all three stages in order appear
    val users = rows.map(_.getAs[Long]("user_id")).toSet
    assert(users.size == rows.length, "one row per user")
  }

  test("packing conserves documents and tokens per language") {
    val packs = TrainingOps.q82SequencePacking.fn(spark, sfDir).collect()
    val docs = Tables(spark, sfDir).documents
      .select(col("lang"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .groupBy("lang").agg(count(lit(1)).as("docs"), sum(col("n")).as("toks"))
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("docs"), r.getAs[Long]("toks"))).toMap
    packs.groupBy(_.getAs[String]("lang")).foreach { case (lang, ps) =>
      assert(ps.map(_.getAs[Long]("n_docs")).sum == docs(lang)._1)
      assert(ps.map(_.getAs[Long]("pack_tokens")).sum == docs(lang)._2)
      assert(ps.forall(_.getAs[Long]("pack_id") >= 0))
    }
  }

  test("quality gate keeps a top set: min kept ttr >= max dropped ttr per lang") {
    val kept = TrainingOps.q83QualityGate.fn(spark, sfDir).collect()
    val all = Tables(spark, sfDir).documents
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("lang"), round(
        size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double"), 9).as("ttr"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[Double]("ttr")))
    val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
    all.groupBy(_._2).foreach { case (lang, ds) =>
      val (in, out) = ds.partition(d => keptIds(d._1))
      assert(in.nonEmpty, s"$lang: gate kept nothing")
      if (out.nonEmpty)
        assert(in.map(_._3).min >= out.map(_._3).max,
          s"$lang: kept a worse doc than one dropped")
    }
  }

  test("source cap: at most 10 per (lang, source), exact when group is small") {
    val rows = TrainingOps.q84SourceCap.fn(spark, sfDir).collect()
    val sizes = Tables(spark, sfDir).documents
      .groupBy("lang", "source").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) -> r.getAs[Long]("n"))
      .toMap
    val byGroup = rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
    assert(byGroup.keySet == sizes.keySet.filter(sizes(_) > 0))
    byGroup.foreach { case (g, rs) =>
      assert(rs.length == math.min(10L, sizes(g)),
        s"$g kept ${rs.length} of ${sizes(g)}")
      assert(rs.map(_.getAs[Long]("rn")).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // determinism: a second run picks the identical survivor set
    val again = TrainingOps.q84SourceCap.fn(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(again == rows.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("denylist scrub: clean docs hash to their original text") {
    val rows = TrainingOps.q85DenylistScrub.fn(spark, sfDir).collect()
    val originals = Tables(spark, sfDir).documents
      .select(col("doc_id"), md5(col("text")).as("h"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("h"), r.getAs[Long]("n"))).toMap
    assert(rows.length == originals.size)
    var hits = 0L
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nHits = r.getAs[Long]("n_hits")
      hits += nHits
      if (nHits == 0) {
        assert(r.getAs[String]("scrub_md5") == originals(id)._1)
        assert(r.getAs[Long]("n_chars_scrubbed") == originals(id)._2)
      } else {
        // every hit replaces a >=3-char word with the 3-char token "[X]"
        assert(r.getAs[Long]("n_chars_scrubbed") <= originals(id)._2)
      }
    }
    assert(hits > 0, "fixture should contain denylisted terms")
  }

  test("q93: power-iteration PC1 is unit-norm, deterministic, and dominates the uniform start") {
    val rows = TrainingOps.q93PowerIterationPca.fn(spark, sfDir).collect()
    assert(rows.length == 64)
    val w = rows.map(r => r.getAs[Number]("dim").longValue() -> r.getAs[Double]("loading")).sortBy(_._1).map(_._2)
    assert(math.abs(w.map(x => x * x).sum - 1.0) < 1e-4, "loading must be unit-norm")
    // determinism: a second evaluation is bit-identical
    val again = TrainingOps.q93PowerIterationPca.fn(spark, sfDir).collect()
      .map(r => r.getAs[Number]("dim").longValue() -> r.getAs[Double]("loading")).sortBy(_._1).map(_._2)
    assert(w.sameElements(again))
    // Rayleigh-quotient monotonicity: variance captured along the iterated
    // direction must be >= variance along the uniform start (power
    // iteration never decreases the quotient on a PSD covariance)
    val flat = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("dim"), col("col").cast("double").as("v"))
    val mu = flat.groupBy(col("dim")).agg(avg(col("v")).as("mu"))
    val xc = flat.join(broadcast(mu), Seq("dim"))
      .select(col("vec_id"), col("dim"), (col("v") - col("mu")).as("x"))
    def variance(dir0: Map[Long, Double]): Double = {
      val wdf = spark.createDataFrame(dir0.toSeq).toDF("dim", "w")
      xc.join(broadcast(wdf), Seq("dim"))
        .groupBy(col("vec_id")).agg(sum(col("x") * col("w")).as("y"))
        .agg(avg(col("y") * col("y"))).head().getDouble(0)
    }
    val pc1 = rows.map(r => r.getAs[Number]("dim").longValue() -> r.getAs[Double]("loading")).toMap
    val uniform = pc1.keys.map(_ -> 1.0 / math.sqrt(64.0)).toMap
    assert(variance(pc1) >= variance(uniform) - 1e-9,
      "iterated direction must capture at least the start's variance")
  }
}
