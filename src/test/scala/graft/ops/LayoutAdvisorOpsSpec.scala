package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q481/q482 semantics: driver replay of the run/delta statistics under
  * the PK order, and the sort-key advisor's defining law — a predicate's
  * own sort key prunes at least as well as any other layout. */
class LayoutAdvisorOpsSpec extends SparkTestBase {

  test("q481: driver replay of runs/ndv/delta under PK order; ladder consistent") {
    val rows = LayoutAdvisorOps.q481EncodingAdvisor.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 6)

    val data = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity").cast("long"),
        col("l_returnflag"), col("l_linestatus"))
      // the operator's canonical TOTAL order: (okey, ln) is not unique in
      // the driver data, so the key extends over every analyzed column
      .collect().sortBy(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5), r.getString(6)))
    def intSeq(i: Int) = data.map(_.getLong(i)).toSeq
    def strSeq(i: Int) = data.map(_.getString(i)).toSeq
    def runsOf[T](xs: Seq[T]): Long =
      1L + xs.sliding(2).count(p => p.size == 2 && p.head != p.last)
    val cols: Seq[(String, Either[Seq[Long], Seq[String]])] = Seq(
      "l_orderkey" -> Left(intSeq(0)), "l_partkey" -> Left(intSeq(2)),
      "l_suppkey" -> Left(intSeq(3)), "l_qty" -> Left(intSeq(4)),
      "l_returnflag" -> Right(strSeq(5)), "l_linestatus" -> Right(strSeq(6)))
    cols.foreach { case (name, vs) =>
      val r = rows(name)
      val (ndv, runs, delta) = vs match {
        case Left(xs) => (xs.distinct.size.toLong, runsOf(xs),
          Some(xs.sliding(2).collect { case Seq(a, b) => math.abs(b - a) }
            .foldLeft(0L)(math.max)))
        case Right(xs) => (xs.distinct.size.toLong, runsOf(xs), None)
      }
      assert(r.getAs[Long]("ndv") == ndv, s"$name ndv")
      assert(r.getAs[Long]("n_runs") == runs, s"$name runs")
      vs match {
        case Left(_) => assert(r.getAs[Long]("max_abs_delta") == delta.get, s"$name delta")
        case Right(_) => assert(r.isNullAt(r.fieldIndex("max_abs_delta")), s"$name delta null")
      }
      val n = data.length.toLong
      val expectedEnc =
        if (runs * 4 <= n) "rle"
        else if (ndv <= 65536) "dict"
        else if (delta.exists(_ <= 65536)) "delta"
        else "plain"
      assert(r.getAs[String]("encoding") == expectedEnc, s"$name encoding")
    }
    // the fixture exercises at least two distinct recommendations
    assert(rows.values.map(_.getAs[String]("encoding")).toSet.size >= 2)
  }

  test("q482: a predicate's own sort key prunes at least as well as any other layout") {
    val rows = LayoutAdvisorOps.q482SortKeyAdvisor.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 3)
    def frac(layout: String, c: String) = rows(layout).getAs[Double](c)
    assert(frac("shipdate", "ship_range_frac") <=
      math.min(frac("pk", "ship_range_frac"), frac("partkey", "ship_range_frac")),
      "shipdate layout must prune the shipdate range best")
    assert(frac("partkey", "partkey_point_frac") <=
      math.min(frac("pk", "partkey_point_frac"), frac("shipdate", "partkey_point_frac")),
      "partkey layout must prune the partkey probe best")
    // the matched layouts genuinely prune (not full scans)
    assert(frac("shipdate", "ship_range_frac") < 0.5)
    assert(frac("partkey", "partkey_point_frac") < 0.25)
    rows.values.foreach(r => assert(r.getAs[Long]("n_buckets") == 64L))
  }
}
