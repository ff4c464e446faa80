package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming KMV ≡ batch KMV: the k-minimum merge is commutative and
  * idempotent, so the final sketch must equal q358's batch output under
  * ANY micro-batch slicing — checked for two slicings and a shuffled
  * order, hash for hash and estimate for estimate. State stays ≤ K. */
class SketchStreamSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  private def replay(rows: Array[(String, Long)], batchSize: Int,
                     name: String): Map[String, (Int, Long, Double)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = SketchStream.sketch(
        input.toDF().toDF("event_type", "user_id"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      rows.grouped(batchSize).foreach { slice =>
        input.addData(slice.toSeq)
        q.processAllAvailable()
      }
      // last emission per type wins (n_kept is monotone; kth strictly
      // improves — key the final state by re-reading the LAST batch rows)
      spark.table(name).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("n_kept"),
          r.getAs[Long]("kth_hash"), r.getAs[Double]("est_kmv")))
        .zipWithIndex
        .groupBy(_._1._1).map { case (t, rs) =>
          val last = rs.maxBy(_._2)._1
          t -> (last._2, last._3, last._4)
        }
    } finally q.stop()
  }

  test("stream == batch for the KMV sketch under two slicings and a shuffled order") {
    val rows = graft.ops.Tables(spark, sf01).events
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // q358's batch answer (est + the k-th hash recomputed batch-side)
    val batch = graft.ops.MeasureOps.q358KmvDistinct.fn(spark, sf01).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("est_kmv")).toMap
    val batchKth = SketchStream.hashed(
        graft.ops.Tables(spark, sf01).events.select(col("event_type"), col("user_id")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, us) =>
        val ks = us.map(_._2).distinct.sorted.take(SketchStream.K)
        t -> (ks.length, ks.last)
      }
    val shuffled = {
      val r = new scala.util.Random(42)
      r.shuffle(rows.toSeq).toArray
    }
    for ((data, slice) <- Seq((rows, 997), (rows, 3001), (shuffled, 1499))) {
      val fin = replay(data, slice, s"kmv_${slice}_${data.eq(rows)}")
      assert(fin.keySet == batch.keySet)
      fin.foreach { case (t, (nKept, kth, est)) =>
        assert(nKept <= SketchStream.K, s"$t: state overflow $nKept")
        assert((nKept, kth) == batchKth(t), s"$t: k-min set diverged from batch")
        assert(est == batch(t), s"$t: streamed estimate $est != batch ${batch(t)}")
      }
    }
  }

  test("merge is idempotent and order-free at the unit level") {
    val us = Array.tabulate(200)(i => ((i * 2654435761L) % (1L << 60)).abs)
    val a = SketchStream.merge(Array.empty, us.iterator)
    val b = SketchStream.merge(Array.empty, us.reverse.iterator)
    val c = SketchStream.merge(a, us.iterator) // re-feeding changes nothing
    assert(a.sameElements(b) && a.sameElements(c))
    assert(a.length == SketchStream.K)
    assert(a.sameElements(us.distinct.sorted.take(SketchStream.K)))
  }
}
