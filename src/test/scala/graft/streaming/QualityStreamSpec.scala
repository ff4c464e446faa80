package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming corpus-quality ledger: the replayed corpus must converge to
  * the batch aggregation under any micro-batch slicing. */
class QualityStreamSpec extends SparkTestBase {

  private def replay(batchSize: Int, name: String): Map[String, (Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.ops.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val input = MemoryStream[(Long, String, String)]
    val q = QualityStream.ledger(input.toDF().toDF("doc_id", "lang", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      docs.grouped(batchSize).foreach { slice =>
        input.addData(slice.toSeq)
        q.processAllAvailable()
      }
      // update-mode memory sink appends each batch's updated rows; the
      // final ledger per lang is the LAST emission
      spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .orderBy(col("seq"))
        .collect()
        .map(r => r.getAs[String]("lang") ->
          (r.getAs[Long]("nDocs"), r.getAs[Long]("nPass"), r.getAs[Long]("nFailLen"),
           r.getAs[Long]("nFailTtr"), r.getAs[Long]("tokMass")))
        .toMap // later entries overwrite earlier — the converged ledger
    } finally q.stop()
  }

  test("stream ≡ batch: per-lang quality ledgers converge to the batch aggregation under two slicings") {
    val batch = QualityStream.ledgerBatch(
        graft.ops.Tables(spark, sfDir).documents)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("nDocs"), r.getAs[Long]("nPass"), r.getAs[Long]("nFailLen"),
         r.getAs[Long]("nFailTtr"), r.getAs[Long]("tokMass"))).toMap
    assert(batch.nonEmpty)
    // the ledger must discriminate: some pass, some fail, per fixture
    assert(batch.values.exists(v => v._2 > 0 && v._2 < v._1),
      "gate passes everything or nothing — ledger untested")

    assert(replay(83, "qledger83") == batch,
      "streamed ledger (slice 83) diverges from batch")
    assert(replay(19, "qledger19") == batch,
      "streamed ledger (slice 19) diverges from batch")
  }
}
