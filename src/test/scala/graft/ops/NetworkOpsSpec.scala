package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the network & allocation wave II (q246–q249):
  * HITS norm/structure laws, the modularity degree identity, Sinkhorn's
  * row-marginal constraint, and coreset unbiasedness.
  */
class NetworkOpsSpec extends SparkTestBase {

  test("HITS: unit L2 norms, root is pure authority, leaves are pure hubs") {
    val rows = NetworkOps.q246Hits.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Double]("hub"), r.getAs[Double]("authority")))
    val byPart = rows.map(r => r._1 -> (r._2, r._3)).toMap
    val hubNorm = math.sqrt(rows.map(r => r._2 * r._2).sum)
    val authNorm = math.sqrt(rows.map(r => r._3 * r._3).sum)
    assert(math.abs(hubNorm - 1.0) < 1e-3, s"hub norm $hubNorm")
    assert(math.abs(authNorm - 1.0) < 1e-3, s"auth norm $authNorm")
    // root (part 1) has no parent → zero hub; it has children → authority
    assert(byPart(1L)._1 == 0.0 && byPart(1L)._2 > 0.0)
    // any leaf (no children in the key range) has zero authority but a hub
    val maxKey = rows.map(_._1).max
    val leaf = rows.filter(r => r._1 * 2 > maxKey && r._1 >= 2)
    assert(leaf.nonEmpty && leaf.forall(_._3 == 0.0), "leaf with authority mass")
    assert(leaf.forall(_._2 > 0.0), "leaf without hub mass")
  }

  test("modularity: degree identity 2m = Σ d_c, bounded contributions") {
    val rows = NetworkOps.q247Modularity.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val dTotal = rows.map(_.getAs[Long]("d_sum")).sum
    assert(dTotal % 2 == 0, s"Σ d_c = $dTotal not even")
    val m = dTotal / 2
    val lTotal = rows.map(_.getAs[Long]("l_in")).sum
    assert(lTotal <= m, s"within-community edges $lTotal exceed m=$m")
    val q = rows.map(_.getAs[Double]("q_contrib")).sum
    assert(q > -1.0 && q < 1.0, s"modularity $q out of range")
    rows.foreach { r =>
      assert(r.getAs[Long]("l_in") * 2 <= r.getAs[Long]("d_sum"),
        s"${r.getAs[String]("p_brand")}: internal edge ends exceed degree mass")
    }
  }

  test("Sinkhorn: plan is non-negative and row masses hit the lang marginal") {
    val rows = NetworkOps.q248Sinkhorn.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("plan") >= 0.0))
    val total = rows.map(_.getAs[Double]("plan")).sum
    assert(math.abs(total - 1.0) < 1e-2, s"plan mass $total != 1")
    // after the final u-update the row marginal is exact by construction
    val share = Tables(spark, sfDir).documents.groupBy(col("lang"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = share.values.sum.toDouble
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, g) =>
      val rm = g.head.getAs[Double]("row_mass")
      assert(math.abs(rm - share(lang) / n) < 1e-4,
        s"$lang: row mass $rm vs marginal ${share(lang) / n}")
    }
  }

  test("coreset: weighted size is an unbiased estimate of the corpus size") {
    val rows = NetworkOps.q249SensitivityCoreset.fn(spark, sfDir).collect()
    val n = Tables(spark, sfDir).embeddings.count()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("weight") > 0))
    assert(rows.length < n, "coreset did not compress")
    val est = rows.map(_.getAs[Double]("weight")).sum
    assert(est > 0.5 * n && est < 1.7 * n,
      s"Σ weights $est far from corpus size $n (kept ${rows.length})")
  }
}
