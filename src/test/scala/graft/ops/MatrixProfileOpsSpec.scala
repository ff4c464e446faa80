package graft.ops

import graft.SparkTestBase

/** q507 semantics: the exact matrix profile replayed window by window —
  * integer Σ(Δcents)² to every non-overlapping neighbor, nearest by
  * (d2, position), top-5 discords by (profile DESC, position). */
class MatrixProfileOpsSpec extends SparkTestBase {

  test("q507: discords == brute-force all-pairs replay") {
    val daily = Tables(spark, sfDir).orders
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) AS c")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toSeq
      .map { case (d, xs) => (d, xs.map(_._2).sum / 100000L) } // kilodollars
      .sortBy(_._1.toEpochDay)

    val m = 7
    val vals = daily.map(_._2).toArray
    val days = daily.map(_._1).toArray
    val nWin = vals.length - m + 1
    def d2(i: Int, j: Int): Long = {
      var s = 0L; var k = 0
      while (k < m) { val d = vals(i + k) - vals(j + k); s += d * d; k += 1 }
      s
    }
    // profile: nearest non-overlapping neighbor per window (1-based pos)
    val profile = (0 until nWin).map { i =>
      var best = Long.MaxValue; var bestJ = -1
      (0 until nWin).foreach { j =>
        if (math.abs(i - j) >= m) {
          val d = d2(i, j)
          if (d < best || (d == best && j < bestJ)) { best = d; bestJ = j }
        }
      }
      (i + 1, days(i), best, bestJ + 1)
    }
    val top5 = profile.sortBy(p => (-p._3, p._1)).take(5)

    val rows = MatrixProfileOps.q507MatrixProfile.fn(spark, sfDir).collect()
    assert(rows.length == math.min(5, top5.length))
    rows.zip(top5).foreach { case (r, (_, day, nnD2, nnPos)) =>
      assert(r.getDate(0).toLocalDate == day, "discord start day")
      assert(r.getAs[Long]("nn_d2") == nnD2, s"profile value @$day")
      assert(r.getAs[Long]("nn_pos") == nnPos.toLong, s"neighbor @$day")
    }
    // law: every profile value is a distance to a REAL window ≥ m away
    top5.foreach { case (pos, _, _, nnPos) =>
      assert(math.abs(pos - nnPos) >= m, "neighbor does not overlap")
    }
  }

  test("min_pair_long == min(struct(a, b)) and plans a HashAggregate, not a SortAggregate") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.min_pair_long
    // keys with ties on a (b breaks them), a null row, and a group of one
    val df = spark.sql(
      """SELECT * FROM VALUES
           (1L, 10L, 5L), (1L, 10L, 3L), (1L, 2L, 9L), (1L, 2L, 11L),
           (2L, 7L, 7L), (2L, CAST(null AS BIGINT), 1L),
           (3L, -4L, 0L)
         AS t(k, a, b)""")
    val fused = df.groupBy(col("k"))
      .agg(min_pair_long(col("a"), col("b")).as("m"))
      .select(col("k"), col("m.a").as("a"), col("m.b").as("b"))
    val viaStruct = df.where(col("a").isNotNull && col("b").isNotNull)
      .groupBy(col("k"))
      .agg(min(struct(col("a"), col("b"))).as("m"))
      .select(col("k"), col("m.a").as("a2"), col("m.b").as("b2"))
    val both = fused.join(viaStruct, Seq("k"), "full")
    assert(both.filter(col("a") =!= col("a2") || col("b") =!= col("b2") ||
      col("a").isNull || col("a2").isNull).count() == 0)
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"expected a hash aggregate:\n$plan")
  }
}
