package graft.functions

import graft.SparkTestBase
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** The codegen'd ZInterleave must match a reference bit-interleave
  * exactly, stay inside whole-stage codegen, and actually deliver the
  * 2D locality that justifies Z-ordering. */
class ZInterleaveSpec extends SparkTestBase {

  private def refZ(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("z_interleave matches the reference interleave on real keys, and de-interleaves back") {
    val rows = Tables(spark, sfDir).lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        LayoutFunctions.z_interleave(col("l_partkey"), col("l_suppkey")).as("z"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == refZ(x, y))
      // de-interleave recovers the low 16 bits of both inputs
      var (rx, ry) = (0L, 0L)
      for (i <- 0 until 16) {
        rx |= ((z >> (2 * i)) & 1L) << i
        ry |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(rx == (x & 0xFFFF) && ry == (y & 0xFFFF))
    }
  }

  test("z_interleave survives whole-stage codegen (no fallback)") {
    val df = Tables(spark, sfDir).lineitem.limit(10)
      .select(LayoutFunctions.z_interleave(col("l_partkey"), col("l_suppkey")).as("z"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.toLowerCase.contains("zinterleave"),
      s"expected codegen in:\n$plan")
    assert(df.collect().forall(_.getLong(0) >= 0))
  }

  test("z-buckets cover compact 2D rectangles: far smaller than the full key area") {
    val rows = graft.ops.ScaleOps.q110ZorderLayout.fn(spark, sfDir).collect()
    assert(rows.length > 1, "fixture must span multiple z-buckets")
    val li = Tables(spark, sfDir).lineitem
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
    val fullArea = (li.getLong(1) - li.getLong(0) + 1).toDouble *
      (li.getLong(3) - li.getLong(2) + 1)
    val avgBucketArea = rows.map { r =>
      (r.getAs[Long]("pk_max") - r.getAs[Long]("pk_min") + 1).toDouble *
        (r.getAs[Long]("sk_max") - r.getAs[Long]("sk_min") + 1)
    }.sum / rows.length
    // each bucket's bounding rectangle must be a small fraction of the
    // full 2D domain — this is exactly the min/max-stat pruning win
    assert(avgBucketArea < fullArea / 4,
      s"avg bucket area $avgBucketArea vs full $fullArea")
  }
}
