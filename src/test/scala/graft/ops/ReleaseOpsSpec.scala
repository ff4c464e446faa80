package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic laws for the corpus-release wave (q298–q301): Good–Turing
  * identities, bootstrap coverage of the plain mean, funnel
  * monotonicity, and budget conservation of the epoch allocation.
  */
class ReleaseOpsSpec extends SparkTestBase {

  test("good-turing: unseen mass recomputes, adjusted counts positive") {
    val rows = ReleaseOps.q298GoodTuring.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("r") >= 1 && r.getAs[Long]("r") <= 10))
    val p0 = rows.map(_.getAs[Double]("p_unseen")).distinct
    assert(p0.size == 1 && p0.head > 0 && p0.head < 1)
    // independent N1/N from the same trigram definition
    val grams = Tables(spark, sfDir).documents
      .select(TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .as("g"))
      .groupBy(col("g")).count()
    val n = grams.agg(sum(col("count"))).collect()(0).getLong(0)
    val n1 = grams.filter(col("count") === 1).count()
    assert(math.abs(p0.head - n1.toDouble / n) < 1e-6)
    rows.foreach { r =>
      Option(r.getAs[java.lang.Double]("r_star")).foreach(v => assert(v > 0))
    }
  }

  test("bayes bootstrap: CI brackets the point estimate, SE positive, point near plain mean") {
    val r = ReleaseOps.q299BayesBootstrap.fn(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_reps") == 32L)
    val (pe, se) = (r.getAs[Double]("point_est"), r.getAs[Double]("boot_se"))
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(se > 0)
    assert(lo <= pe && pe <= hi)
    val plain = Tables(spark, sfDir).documents
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(math.abs(pe - plain) < 6 * se,
      s"bootstrap point $pe far from plain mean $plain (se $se)")
  }

  test("release funnel: stages only shrink, cap respected, totals account for every train doc") {
    val rows = ReleaseOps.q300ReleaseFunnel.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = Seq("docs_in", "after_gate", "after_dedup", "after_decon", "after_cap")
        .map(c => r.getAs[Long](c))
      assert(f.sliding(2).forall { case Seq(a, b) => b <= a },
        s"funnel grew for lang ${r.getAs[String]("lang")}: $f")
      if (r.getAs[Long]("after_cap") > 0) assert(r.getAs[Long]("tokens_final") > 0)
    }
    val trainTotal = Tables(spark, sfDir).documents
      .filter(col("doc_id") % 100 =!= 0).count()
    assert(rows.map(_.getAs[Long]("docs_in")).sum == trainTotal)
    // cap bound: ≤ 200 per (lang, source) pair present
    val srcPerLang = Tables(spark, sfDir).documents
      .filter(col("doc_id") % 100 =!= 0)
      .select(col("lang"), col("source")).distinct()
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("after_cap") <= 200L * srcPerLang(r.getAs[String]("lang")))
    }
  }

  test("epoch allocation: shares sum to 1, epochs capped at 4, budget conserved") {
    val rows = ReleaseOps.q301EpochAllocation.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-4)
    rows.foreach { r =>
      val e = r.getAs[Double]("epochs")
      assert(e > 0 && e <= 4.0 + 1e-6)
    }
    val totalMass = rows.map(_.getAs[Long]("mass")).sum
    val alloc = rows.map(_.getAs[Double]("alloc_tokens")).sum
    // allocation never exceeds the budget; equals it when the cap still
    // leaves an uncapped language to absorb the redistribution round
    assert(alloc <= totalMass / 2.0 + 1.0)
    if (rows.exists(r => !r.getAs[Boolean]("capped")))
      assert(math.abs(alloc - totalMass / 2.0) < math.max(1.0, totalMass * 1e-6),
        s"budget not conserved: alloc $alloc vs ${totalMass / 2.0}")
  }
}
