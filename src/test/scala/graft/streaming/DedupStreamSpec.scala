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

  /** Replay the arrival batch through the incremental gate (standing index
    * as initial state) in id-order slices; return per-doc decisions. */
  private def replayIncremental(arrivals: Array[(Long, String)], batchSize: Int,
                                name: String): Map[Long, (Int, Option[Long], Option[Boolean])] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val standing = graft.ops.Tables(spark, sfDir).documents
      .filter(col("doc_id") % 10 =!= 0)
    val input = MemoryStream[(Long, String)]
    val q = DedupStream.incrementalGate(input.toDF().toDF("doc_id", "text"), standing)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      arrivals.grouped(batchSize).foreach { slice =>
        input.addData(slice.toSeq)
        q.processAllAvailable()
      }
      DedupStream.incrementalDecisions(spark.table(name)).collect()
        .map(r => r.getLong(0) -> (r.getInt(1),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toMap
    } finally q.stop()
  }

  test("incremental gate (q332's standing corpus + batch probe): stream ≡ batch " +
       "under two slicings, and candidates cover q332's batch-touching pairs") {
    val arrivals = docsSorted.filter(_._1 % 10 == 0)
    assert(arrivals.nonEmpty)
    val standing = graft.ops.Tables(spark, sfDir).documents
      .filter(col("doc_id") % 10 =!= 0)
    val arrivalsDf = graft.ops.Tables(spark, sfDir).documents
      .filter(col("doc_id") % 10 === 0)
    val batch = DedupStream.incrementalGateBatch(arrivalsDf, standing)
      .collect().map(r => r.getLong(0) -> (r.getInt(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toMap

    val s17 = replayIncremental(arrivals, 17, "incgate17")
    assert(s17 == batch, "incremental stream (slice 17) diverges from the batch twin")
    val s5 = replayIncremental(arrivals, 5, "incgate5")
    assert(s5 == batch, "incremental stream (slice 5) diverges from the batch twin")

    // decisions must actually exercise both owner kinds on this fixture
    val flagged = batch.filter(_._2._1 == 1)
    assert(flagged.nonEmpty, "no arrival flagged — gate untested")
    assert(flagged.exists(_._2._3.contains(true)), "no standing-owned candidate")
    // q332 contract: every verified near-dup pair touching the batch era has
    // its batch member flagged by the gate (candidates ⊇ verified pairs)
    val pairs = graft.ops.Dedup.q28MinhashLsh.fn(spark, sfDir)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a % 10 == 0 || b % 10 == 0 }
    assert(pairs.nonEmpty, "no batch-touching q28 pairs at this SF")
    pairs.foreach { case (a, b) =>
      // the gate's decision lives on the LATER member in arrival order:
      // batch docs follow all standing docs, then order by id
      val probe = if (a % 10 == 0 && b % 10 == 0) math.max(a, b)
                  else if (a % 10 == 0) a else b
      assert(batch(probe)._1 == 1,
        s"q332 batch-touching pair ($a,$b): batch member $probe not flagged")
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
