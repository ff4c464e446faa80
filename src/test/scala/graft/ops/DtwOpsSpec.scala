package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q485 semantics: the wavefront-diagonal fold computes TRUE dynamic time
  * warping — re-derived per nation by an independent classic row-by-row
  * O(n²) DP in plain Scala over independently rebuilt series. */
class DtwOpsSpec extends SparkTestBase {

  private def classicDtw(a: Array[Long], b: Array[Long]): Long = {
    val n = a.length
    val Inf = Long.MaxValue / 4
    val dp = Array.fill(n + 1, n + 1)(Inf)
    dp(0)(0) = 0L
    for (i <- 1 to n; j <- 1 to n)
      dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
    dp(n)(n)
  }

  test("q485: diagonal fold == classic DP for every nation; dtw <= lockstep") {
    // independently rebuilt weekly series
    val t = Tables(spark, sfDir)
    val counts = t.orders
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nk"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).as("dd"))
      .filter(col("dd") >= 0 && col("dd") < 7 * 32) // raw-day filter, then /7
      .select(col("nk"), (col("dd") / 7).cast("long").as("pos"))
      .groupBy(col("nk"), col("pos")).count()
      .collect()
      .groupBy(_.getAs[Int]("nk"))
      .map { case (nk, rs) =>
        val arr = Array.fill(32)(0L)
        rs.foreach(r => arr(r.getAs[Long]("pos").toInt) = r.getAs[Long]("count"))
        nk -> arr
      }
    val names = t.nation.collect()
      .map(r => r.getAs[String]("n_name") -> r.getAs[Int]("n_nationkey")).toMap
    val ref = counts.getOrElse(0, Array.fill(32)(0L))

    val rows = DtwOps.q485DtwWarp.fn(spark, sfDir).collect()
    assert(rows.length == names.size, "one row per nation")
    rows.foreach { r =>
      val nk = names(r.getAs[String]("n_name"))
      val a = counts.getOrElse(nk, Array.fill(32)(0L))
      val expect = classicDtw(a, ref)
      val dtw = r.getAs[Long]("dtw_cost")
      assert(dtw == expect, s"nation $nk: fold $dtw != classic DP $expect")
      val lockstep = r.getAs[Long]("lockstep_cost")
      assert(lockstep == a.zip(ref).map { case (x, y) => math.abs(x - y) }.sum)
      assert(dtw <= lockstep, s"nation $nk: DTW $dtw > lockstep $lockstep")
      if (nk == 0) assert(dtw == 0L, "self-alignment must be free")
    }
    // the fixture exercises real warping somewhere, not just equality
    assert(rows.exists(r => r.getAs[Long]("dtw_cost") <
      r.getAs[Long]("lockstep_cost")), "no nation gained from warping")
  }
}
