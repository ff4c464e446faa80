package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for wave q468–q469: a per-nation ANOVA-style
  * variance-split replay (strength ∈ [0, 1], SS_between ≤ SS_total by
  * construction) and a decile-report replay of the per-part CV
  * distribution (deciles partition, CVs non-decreasing across
  * deciles, bucket sizes balanced).
  */
class SeasonalCatalogOpsSpec extends SparkTestBase {

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q468: variance-split replay per nation; strength bounded") {
    val rows = SeasonalCatalogOps.q468SeasonalStrength.fn(spark, sfDir).collect()
    assert(rows.length == 25)
    val monthly = Tables(spark, sfDir).orders
      .join(Tables(spark, sfDir).customer
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("nk")),
        Seq("o_custkey"))
      .groupBy(col("nk"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("m"),
        month(col("o_orderdate")).cast("long").as("moy"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(18,0)").cast("long").as("y"))
      .collect()
      .map(x => (x.getAs[Number]("nk").longValue, x.getAs[Long]("moy"),
        x.getAs[Long]("y")))
    val byNk = monthly.groupBy(_._1)
    rows.foreach { row =>
      val nk = row.getAs[Long]("nation")
      val ys = byNk(nk)
      val n = ys.length
      assert(row.getAs[Long]("n_months") == n.toLong)
      val mu = ys.map(_._3).sum.toDouble / n
      val sst = ys.map(x => (x._3 - mu) * (x._3 - mu)).sum
      val cells = ys.groupBy(_._2)
      val ssbRaw = cells.values.map { c =>
        BigDecimal(r(c.map(_._3).sum.toDouble * c.map(_._3).sum / c.length, 2))
      }.sum.toDouble
      val ssb = ssbRaw - n * mu * mu
      val strength = r(ssb / sst, 6)
      assert(math.abs(row.getAs[Double]("strength") - strength) < 1e-5,
        s"nation $nk")
      assert(strength >= -1e-9 && strength <= 1.0 + 1e-9,
        "SS_between within SS_total")
      val peak = cells.maxBy { case (moy, c) =>
        (r(c.map(_._3).sum.toDouble / c.length, 4), moy) }
      assert(row.getAs[Long]("peak_month") == peak._1)
    }
  }

  test("q469: decile report partitions the per-part CV distribution") {
    val rows = SeasonalCatalogOps.q469PriceDispersion.fn(spark, sfDir).collect()
    assert(rows.length == 10)
    val nParts = rows.map(_.getAs[Long]("n_parts")).sum
    // replay the per-part census size
    val expected = Tables(spark, sfDir).lineitem
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).count()
    assert(nParts == expected, "deciles partition the audited parts")
    // bucket balance: ntile sizes differ by at most 1
    val sizes = rows.map(_.getAs[Long]("n_parts"))
    assert(sizes.max - sizes.min <= 1)
    // CV ranges non-decreasing and non-overlapping across deciles
    val sorted = rows.sortBy(_.getAs[Long]("decile"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("cv_max") <= b.getAs[Double]("cv_min") + 1e-9)
    }
    rows.foreach(x => assert(x.getAs[Double]("cv_min") >= 0))
  }
}
