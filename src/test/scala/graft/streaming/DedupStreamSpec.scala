package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming MinHash near-dup gate (verdict r7 #6): the corpus replayed as
  * micro-batches must produce exactly the batch gate's decisions, under
  * any batch slicing. */
class DedupStreamSpec extends SparkTestBase {

  private def docsSorted: Array[(Long, String)] =
    graft.ops.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

  /** Replay `docs` in arrival (doc_id) order in slices of `batchSize`,
    * return the per-doc gate decisions. */
  private def replay(docs: Array[(Long, String)], batchSize: Int,
                     name: String): Map[Long, (Int, Option[Long])] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = DedupStream.nearDupGate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      docs.grouped(batchSize).foreach { slice =>
        input.addData(slice.toSeq)
        q.processAllAvailable()
      }
      DedupStream.decisions(spark.table(name)).collect()
        .map(r => r.getLong(0) -> (r.getInt(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    } finally q.stop()
  }

  test("stream ≡ batch: replayed corpus gate equals the batch min-owner gate, " +
       "for two different micro-batch slicings") {
    val docs = docsSorted
    assert(docs.length == 500)
    val batch = DedupStream.nearDupGateBatch(
        graft.ops.Tables(spark, sfDir).documents)
      .collect().map(r => r.getLong(0) -> (r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

    val streamed71 = replay(docs, 71, "dedupgate71")
    assert(streamed71 == batch,
      "streamed decisions (slice 71) diverge from the batch gate")

    val streamed13 = replay(docs, 13, "dedupgate13")
    assert(streamed13 == batch,
      "streamed decisions (slice 13) diverge from the batch gate")

    // the fixture really exercises the gate: some docs flagged, most not
    val flagged = batch.count(_._2._1 == 1)
    assert(flagged > 0, "no near-dup candidates in fixture — gate untested")
    assert(flagged < docs.length / 2, s"gate flags half the corpus ($flagged)")
    // every flagged doc's first owner is an earlier doc
    batch.foreach { case (id, (f, owner)) =>
      if (f == 1) assert(owner.exists(_ < id))
      else assert(owner.isEmpty)
    }
  }

  test("gate admits every q28 near-dup pair (candidate completeness on the " +
       "later member)") {
    // q28's verified pairs (jac >= 0.5) share at least one band key by
    // construction at these constants; the later member of each pair must
    // therefore be flagged by the gate.
    val pairs = graft.ops.Dedup.q28MinhashLsh.fn(spark, sfDir)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no q28 pairs at this SF — completeness untestable")
    val batch = DedupStream.nearDupGateBatch(
        graft.ops.Tables(spark, sfDir).documents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs.foreach { case (a, b) =>
      val later = math.max(a, b)
      assert(batch(later) == 1,
        s"q28 pair ($a,$b): later member $later not flagged by the gate")
    }
  }
}
