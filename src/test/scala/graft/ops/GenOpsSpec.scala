package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the generation & diagnostics wave (q286–q289):
  * temperature-entropy ordering, repeat accounting, position-curve
  * normalization, and the clipping monotonicity of importance-weight
  * diagnostics.
  */
class GenOpsSpec extends SparkTestBase {

  test("temperature: entropy strictly ordered T=0.5 ≤ T=1 ≤ T=2 per context") {
    val rows = GenOps.q286TemperatureEntropy.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[Double]("temperature"),
        r.getAs[Long]("n_continuations"), r.getAs[Double]("entropy")))
    val byCtx = rows.groupBy(_._1)
    assert(byCtx.size == 5, s"expected 5 contexts, got ${byCtx.size}")
    byCtx.foreach { case (w1, g) =>
      val byT = g.map(x => x._2 -> x._4).toMap
      assert(byT.keySet == Set(0.5, 1.0, 2.0))
      assert(byT(0.5) <= byT(1.0) + 1e-6, s"$w1: sharpening raised entropy")
      assert(byT(1.0) <= byT(2.0) + 1e-6, s"$w1: flattening lowered entropy")
      val n = g.head._3
      g.foreach(x => assert(x._4 >= -1e-9 && x._4 <= math.log(n.toDouble) + 1e-6))
    }
  }

  test("tandem repeats: accounting identities against an independent token count") {
    val rows = GenOps.q287TandemRepeats.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val tokTotal = Tables(spark, sfDir).documents
      .select(size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == tokTotal)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val mx = r.getAs[Long]("max_run")
      val rep = r.getAs[Long]("n_repeats")
      assert(mx >= 1 && mx <= n)
      assert(rep >= mx - 1, "max run implies at least max_run-1 repeats")
      assert(rep < n, "cannot repeat more than n-1 times")
    }
  }

  test("position bias: positions dense from 1, pos-1 ratio is exactly 1, counts decrease") {
    val rows = GenOps.q288PositionBias.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("position"), r.getAs[Long]("n_events"),
        r.getAs[Double]("ctr"), r.getAs[Double]("bias_vs_pos1")))
      .sortBy(_._1)
    assert(rows.head._1 == 1L)
    assert(math.abs(rows.head._4 - 1.0) < 1e-9, "position-1 bias must be 1")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._1 == a._1 + 1, "positions not dense")
      assert(b._2 <= a._2, "more events at a deeper position than a shallower one")
    }
    rows.foreach { case (_, _, ctr, bias) =>
      assert(ctr >= 0 && ctr <= 1)
      assert(bias >= 0)
    }
  }

  test("weight diagnostics: ESS bounded by n, clipping only raises ESS") {
    val r = GenOps.q289WeightDiagnostics.fn(spark, sfDir).collect()(0)
    val n = r.getAs[Long]("n_docs")
    val ess = r.getAs[Double]("ess")
    val essC = r.getAs[Double]("ess_clipped")
    assert(n == Tables(spark, sfDir).documents.count())
    assert(ess > 0 && ess <= n + 1e-6)
    assert(essC >= ess - 1e-6, s"clipping lowered ESS: $ess -> $essC")
    assert(r.getAs[Double]("ess_share") <= 1.0 + 1e-9)
    val cms = r.getAs[Double]("clipped_mass_share")
    assert(cms >= 0 && cms < 0.5, s"clipped mass share $cms")
    assert(r.getAs[Double]("p99_w") > 0)
  }
}
