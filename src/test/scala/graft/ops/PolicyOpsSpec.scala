package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the policy-evaluation & uncertainty wave
  * (q242–q245): IPS/SNIPS identities under a constant within-group
  * weight, conformal coverage at its promised level, bootstrap sanity
  * against the true mean, and the exact Kneser-Ney sum-to-one law.
  */
class PolicyOpsSpec extends SparkTestBase {

  test("IPS: within a policy-action group SNIPS is the matched-mean and ESS = n_matched") {
    val rows = PolicyOps.q242IpsPolicyEval.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nMatched = r.getAs[Long]("n_matched")
      val ess = r.getAs[Double]("ess")
      assert(nMatched >= 1, s"${r.getAs[String]("pi_a")}: no matched events")
      // all matched events in a pi_a group share the same action, hence
      // the same propensity weight — ESS must collapse to n_matched
      assert(math.abs(ess - nMatched) < 0.01,
        s"${r.getAs[String]("pi_a")}: ess $ess != n_matched $nMatched")
      assert(r.getAs[Double]("ips") >= 0.0)
      assert(r.getAs[Double]("snips") >= 0.0)
    }
    // SNIPS = plain mean reward over matched events (constant w cancels)
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), coalesce(col("value"), lit(0.0)).as("r"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val modal = ev.groupBy(_._1).map { case (u, g) =>
      u -> g.groupBy(_._2).map { case (t, v) => (t, v.size) }
        .toSeq.minBy { case (t, c) => (-c, t) }._1
    }
    val bySnips = rows.map(r => r.getAs[String]("pi_a") -> r.getAs[Double]("snips")).toMap
    bySnips.keys.foreach { a =>
      val matched = ev.filter(e => modal(e._1) == a && e._2 == a).map(_._3)
      val mean = matched.sum / matched.size
      assert(math.abs(bySnips(a) - mean) < 1e-4,
        s"$a: snips ${bySnips(a)} vs matched mean $mean")
    }
  }

  test("conformal: promised 90% coverage holds within binomial noise, q_hat shared") {
    val rows = PolicyOps.q243ConformalInterval.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val qhats = rows.map(_.getAs[Double]("q_hat")).distinct
    assert(qhats.length == 1, s"q_hat differs across groups: ${qhats.mkString(",")}")
    assert(qhats.head > 0)
    val n = rows.map(_.getAs[Long]("n_test")).sum
    val cov = rows.map(_.getAs[Long]("n_covered")).sum.toDouble / n
    assert(cov > 0.84 && cov < 0.97,
      s"pooled test coverage $cov strays from the promised 0.9 (n=$n)")
  }

  test("bootstrap: replicate count fixed, SE positive, boot mean near the true mean") {
    val rows = PolicyOps.q244PoissonBootstrap.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val truth = Tables(spark, sfDir).orders
      .groupBy(col("o_orderpriority"))
      .agg((sum(col("o_totalprice")) / count(lit(1))).as("mu"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val g = r.getAs[String]("o_orderpriority")
      assert(r.getAs[Long]("n_reps") == 32L)
      val se = r.getAs[Double]("boot_se")
      val bm = r.getAs[Double]("boot_mean")
      assert(se > 0, s"$g: zero bootstrap SE")
      assert(math.abs(bm - truth(g)) < 6 * se,
        s"$g: boot mean $bm vs true ${truth(g)} (se $se)")
    }
  }

  test("Kneser-Ney: conditional distribution sums to one exactly, ppl = exp(nll)") {
    val out = PolicyOps.q245KneserNey.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nll = r.getAs[Double]("avg_nll")
      assert(nll > 0)
      assert(math.abs(r.getAs[Double]("ppl") - math.exp(nll)) < 1e-3)
    }
    // rebuild the bigram model locally and verify Σ_w2 P_KN(w2|w1) = 1:
    // the discounted mass exactly equals the continuation mass handed back
    val docs = Tables(spark, sfDir).documents.select(col("text")).collect()
      .map(_.getString(0).toLowerCase)
    val toks = docs.map("""\w+""".r.findAllIn(_).toArray).filter(_.length >= 2)
    val bigrams = toks.flatMap(t => t.dropRight(1).zip(t.drop(1)))
    val c12 = bigrams.groupBy(identity).map { case (k, v) => (k, v.size) }
    val c1 = bigrams.groupBy(_._1).map { case (k, v) => (k, v.size) }
    val fwd = c12.keys.toSeq.groupBy(_._1).map { case (k, v) => (k, v.size) }
    val rev = c12.keys.toSeq.groupBy(_._2).map { case (k, v) => (k, v.size) }
    val types = c12.size.toDouble
    val d = 0.75
    c1.keys.take(5).foreach { w1 =>
      val total = rev.keys.iterator.map { w2 =>
        val disc = math.max(c12.getOrElse((w1, w2), 0) - d, 0.0) / c1(w1)
        disc + (d / c1(w1)) * fwd(w1) * (rev(w2) / types)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9, s"Σ P(·|$w1) = $total")
    }
  }
}
