package graft.functions

import graft.SparkTestBase
import graft.functions.Aggregators.QuantileSketch
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** Merge-law contract of the derandomized KLL-style quantile sketch:
  * the exactly-tracked error budget must bound the TRUE rank error of
  * every quantile estimate under EVERY merge tree — Spark's shuffle
  * chooses the merge order, so the guarantee cannot depend on it. */
class QuantileSketchSpec extends SparkTestBase {

  private val agg = QuantileSketch.k256
  private def sketchOf(xs: Seq[Long], parts: Int): Aggregators.QSummary = {
    // fold each slice (reduce path), then merge the partials pairwise in
    // slice order — one concrete merge tree per `parts`
    val partials = xs.grouped(math.max(1, xs.size / parts)).map { slice =>
      slice.foldLeft(agg.zero)(agg.reduce)
    }.toSeq
    agg.finish(partials.reduce(agg.merge))
  }

  private def checkBound(xs: Seq[Long], s: Aggregators.QSummary): Unit = {
    assert(s.n == xs.size)
    val sorted = xs.sorted
    val budget = s.err + s.maxW
    for (phi <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val t = math.ceil(phi * s.n).toLong
      val est = QuantileSketch.query(s, t)
      // duplicate-safe two-sided bound: t must fall inside the estimate's
      // true rank interval [count(<est), count(<=est)] widened by budget
      val le = sorted.count(_ <= est).toLong
      val lt = sorted.count(_ < est).toLong
      assert(le >= t - budget && lt <= t + budget,
        s"phi=$phi: t=$t outside [$lt, $le] +- err=${s.err} + maxW=${s.maxW}")
    }
  }

  test("rank error <= tracked budget under 4 merge trees; budget <= n/8") {
    // adversarial-ish input: sorted runs, reverse runs, duplicates
    val xs = (0L until 20000L).map(i => (i * 37) % 4001) ++
      (0L until 5000L).map(_ => 7L) ++ (5000L to 0L by -1L)
    for (parts <- Seq(1, 2, 8, 32)) {
      val s = sketchOf(xs, parts)
      checkBound(xs, s)
      assert((s.err + s.maxW) * 8 <= s.n,
        s"parts=$parts: budget ${s.err + s.maxW} exceeds n/8 of ${s.n}")
    }
  }

  test("foldPartition is bit-identical to the Aggregator's reduce fold") {
    val xs = (0L until 9000L).map(i => (i * 131) % 2003) ++ Seq.fill(300)(42L)
    val viaReduce = xs.foldLeft(agg.zero)(agg.reduce)
    val viaFold = QuantileSketch.foldPartition(xs.iterator, 256)
    assert(viaFold == viaReduce,
      "mutable fold must stay in algebraic lockstep with reduce()")
  }

  test("merge is weight-exact: total weight == n, err adds, no item lost") {
    val a = (0L until 3000L).foldLeft(agg.zero)(agg.reduce)
    val b = (3000L until 7000L).foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(a, b)
    val s = agg.finish(m)
    assert(s.weights.sum == 7000L, "stored weights must sum to n exactly")
    assert(m.n == 7000L && m.err >= a.err + b.err,
      "merge must carry both error budgets")
  }

  test("below-capacity sketch is EXACT (err = 0, every rank answered exactly)") {
    val xs = Seq.tabulate(200)(i => ((i * 83) % 97).toLong)
    val s = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(s.err == 0L && s.maxW == 1L)
    val sorted = xs.sorted
    for (t <- 1L to xs.size.toLong)
      assert(QuantileSketch.query(s, t) == sorted((t - 1).toInt))
  }

  test("q490 replay: exact selection == full-sort truth; audits all true") {
    val rows = graft.ops.QuantileSelOps.q490QuantileSelect
      .fn(spark, sfDir).collect().sortBy(_.getAs[Double]("phi"))
    assert(rows.length == 5)
    val cents = Tables(spark, sfDir).lineitem
      .select(floor(col("l_extendedprice") * 100 + lit(0.5))
        .cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    for (r <- rows) {
      val t = math.ceil(r.getAs[Double]("phi") * cents.length).toLong
      assert(r.getAs[Long]("exact_cents") == cents((t - 1).toInt),
        s"phi=${r.getAs[Double]("phi")}: selection != sorted truth")
      assert(r.getAs[Boolean]("sketch_ok") && r.getAs[Boolean]("bound_ok"))
      assert(r.getAs[Long]("n") == cents.length.toLong)
    }
  }
}
