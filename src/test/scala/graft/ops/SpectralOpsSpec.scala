package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantic checks for q448: the engine's power-iteration embedding is
  * compared against an INDEPENDENT cyclic-Jacobi eigendecomposition of
  * the same normalized adjacency (|cos| with the true Fiedler direction
  * must be high — this asserts actual convergence, not just
  * determinism), the sweep cut is replayed for optimality, and the
  * spectral laws hold (λ₂ ∈ (0, 2), embedding ⟂ √deg, both sides
  * nonempty).
  */
class SpectralOpsSpec extends SparkTestBase {

  /** cyclic Jacobi on a small dense symmetric matrix */
  private def jacobiEig(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until 100; p <- 0 until n; q <- p + 1 until n) {
      if (math.abs(a(p)(q)) > 1e-13) {
        val theta = 0.5 * math.atan2(2 * a(p)(q), a(q)(q) - a(p)(p))
        val (c, s) = (math.cos(theta), math.sin(theta))
        for (k <- 0 until n) {
          val (akp, akq) = (a(k)(p), a(k)(q))
          a(k)(p) = c * akp - s * akq; a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until n) {
          val (apk, aqk) = (a(p)(k), a(q)(k))
          a(p)(k) = c * apk - s * aqk; a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until n) {
          val (vkp, vkq) = (v(k)(p), v(k)(q))
          v(k)(p) = c * vkp - s * vkq; v(k)(q) = s * vkp + c * vkq
        }
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  test("q448: embedding matches the true Fiedler direction; sweep optimal; laws") {
    val rows = SpectralOps.q448SpectralBipartition.fn(spark, sfDir).collect()
    val n = rows.length
    assert(n >= 4)
    // rebuild the thinned symmetrized graph driver-side
    val t = Tables(spark, sfDir)
    val li = t.lineitem
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sid"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ts"))
    val wSeq = Window.partitionBy(col("p")).orderBy(col("ts"), col("sid"))
    val supNation = t.supplier.select(col("s_suppkey").as("sid"),
      col("s_nationkey").as("nk"))
    val sym = li
      .withColumn("nv", lead(col("sid"), 1).over(wSeq))
      .where(col("nv").isNotNull && col("nv") =!= col("sid"))
      .join(broadcast(supNation), Seq("sid"))
      .join(broadcast(supNation.select(col("sid").as("nv"),
        col("nk").as("nk2"))), Seq("nv"))
      .where(col("nk") =!= col("nk2"))
      .groupBy(col("nk").as("du"), col("nk2").as("dv"))
      .agg(count(lit(1)).as("w"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("du")).orderBy(col("w").desc, col("dv"))))
      .where(col("rn") <= 3)
      .groupBy(least(col("du"), col("dv")).as("a"),
        greatest(col("du"), col("dv")).as("b"))
      .agg(sum(col("w")).as("w")).collect()
      .map(r => (r.getAs[Number]("a").longValue,
        r.getAs[Number]("b").longValue, r.getAs[Long]("w")))
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val w = Array.fill(n, n)(0.0)
    sym.foreach { case (a, b, ww) =>
      w(idx(a))(idx(b)) += ww.toDouble; w(idx(b))(idx(a)) += ww.toDouble
    }
    val d = w.map(_.sum)
    val m = Array.tabulate(n, n)((i, j) =>
      (if (i == j) 1.0 else 0.0) + w(i)(j) / math.sqrt(d(i) * d(j)))
    val (evals, evecs) = jacobiEig(m)
    // second-largest eigenpair of M = Fiedler of L_sym
    val order = evals.indices.sortBy(evals).reverse
    val fiedler = Array.tabulate(n)(i => evecs(i)(order(1)))
    val byNode = rows.map(r => r.getAs[Long]("nation") ->
      r.getAs[Double]("fiedler")).toMap
    val emb = nodes.map(byNode)
    val cos = emb.zip(fiedler).map { case (x, y) => x * y }.sum /
      (math.sqrt(emb.map(x => x * x).sum) *
        math.sqrt(fiedler.map(x => x * x).sum))
    assert(math.abs(cos) > 0.98,
      s"|cos| with true Fiedler = ${math.abs(cos)} — power iteration converged")
    // λ₂ law vs Jacobi's exact value
    val lambda2 = rows.head.getAs[Double]("lambda2")
    assert(math.abs(lambda2 - (2.0 - evals(order(1)))) < 0.02,
      s"Rayleigh λ₂ $lambda2 vs Jacobi ${2.0 - evals(order(1))}")
    assert(lambda2 > 0 && lambda2 < 2)
    // embedding ⟂ √deg (deflation worked)
    val u = d.map(math.sqrt)
    val dot = emb.zip(u).map { case (x, y) => x * y }.sum /
      (math.sqrt(emb.map(x => x * x).sum) * math.sqrt(u.map(x => x * x).sum))
    assert(math.abs(dot) < 1e-6, s"deflated: <v, sqrt(deg)> = $dot")
    // sweep-cut optimality replay over all thresholds
    val bySr = rows.sortBy(_.getAs[Long]("sweep_rank"))
    val srOf = bySr.map(_.getAs[Long]("nation")).zipWithIndex
      .map { case (nd, i) => nd -> (i + 1) }.toMap
    val degOf = nodes.zip(d).toMap
    val volTot = d.sum
    val phis = (1 until n).map { k =>
      val cut = sym.collect { case (a, b, ww)
        if math.min(srOf(a), srOf(b)) <= k && k < math.max(srOf(a), srOf(b)) =>
        ww }.sum.toDouble
      val vol = bySr.take(k).map(r => degOf(r.getAs[Long]("nation"))).sum
      cut / math.min(vol, volTot - vol)
    }
    val bestPhi = phis.min
    val conduct = rows.head.getAs[Double]("conductance")
    assert(math.abs(conduct - bestPhi) < 1e-5,
      s"sweep picked the minimal-conductance threshold: $conduct vs $bestPhi")
    val sides = rows.map(_.getAs[Boolean]("side_a"))
    assert(sides.exists(identity) && sides.exists(!_), "both sides nonempty")
  }
}
