package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the compaction-planning wave (q400): the plan is
  * replayed in Scala and the packing laws hold — mass conservation,
  * contiguous bins, and every non-final bin at least target-sized when
  * closed.
  */
class CompactOpsSpec extends SparkTestBase {

  test("q400: plan matches replay and packing laws hold") {
    val rows = CompactOps.q400CompactionPlan.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)

    val files = Tables(spark, sfDir).documents
      .groupBy(col("source"), pmod(col("doc_id"), lit(32L)).as("bucket"))
      .agg(sum(col("n_chars")).as("bytes")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val target = files.map(_._3).sum * 4 / files.length
    assert(rows.head.getAs[Long]("t_target") == target)

    files.groupBy(_._1).foreach { case (src, fs) =>
      val sorted = fs.sortBy(f => (-f._3, f._2))
      var cum = 0L
      val bins = sorted.map { f =>
        val b = cum / target; cum += f._3; (b, f._3)
      }
      val byBin = bins.groupBy(_._1).map { case (b, g) =>
        b -> (g.length.toLong, g.map(_._2).sum)
      }
      val got = rows.filter(_.getAs[String]("source") == src)
      assert(got.length == byBin.size)
      assert(got.head.getAs[Long]("n_bins") == byBin.size.toLong)
      got.foreach { r =>
        val (nf, bytes) = byBin(r.getAs[Long]("bin"))
        assert(r.getAs[Long]("n_files") == nf)
        assert(r.getAs[Long]("planned_bytes") == bytes)
      }
      // mass conservation within source
      assert(got.map(_.getAs[Long]("planned_bytes")).sum == fs.map(_._3).sum)
      // packing law: when a non-final bin closes, the cumulative mass
      // has crossed (b+1)·target — that's what the cum DIV target
      // assignment guarantees
      val maxBin = byBin.keys.max
      val order = byBin.keys.toSeq.sorted
      var prefix = 0L
      order.foreach { b =>
        prefix += byBin(b)._2
        if (b < maxBin) assert(prefix >= (b + 1) * target,
          s"$src bin $b closed under target")
      }
    }
  }
}
