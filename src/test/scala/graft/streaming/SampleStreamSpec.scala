package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming weighted reservoir: replaying the documents table as
  * micro-batches must reproduce q112's batch sample EXACTLY — same 50
  * documents in the same order — under two different slicings, because
  * the deterministic-hash ES key makes top-k an associative fold. */
class SampleStreamSpec extends SparkTestBase {

  private def docsSorted: Array[(Long, String, String, Long)] =
    graft.ops.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)

  private def replay(rows: Array[(Long, String, String, Long)],
                     batchSize: Int): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val store = new SampleStream.SampleStore
    val q = SampleStream.maintain(
      input.toDF().toDF("doc_id", "lang", "source", "n_chars"), store)
    try {
      rows.grouped(batchSize).foreach { slice =>
        input.addData(slice.toSeq)
        q.processAllAvailable()
      }
      store.snapshot.map(k => (k.docId, k.lang, k.source, k.nChars))
    } finally q.stop()
  }

  test("stream ≡ batch: reservoir equals q112's sample under two slicings") {
    val expected = graft.ops.Reshape.q112WeightedSample.fn(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[Long]("n_chars"))).toSeq
    assert(expected.length == SampleStream.K, "batch sample is not full")

    val rows = docsSorted
    for (slice <- Seq(37, 400)) {
      val sampled = replay(rows, slice)
      assert(sampled == expected,
        s"reservoir (slice $slice) diverges from q112's batch sample")
    }
  }

  test("merge is idempotent per batch id (foreachBatch retry contract)") {
    val store = new SampleStream.SampleStore
    val rows = Seq(SampleStream.Kept(-0.001, 7L, "en", "web", 100L))
    store.merge(0L, rows)
    store.merge(0L, rows)
    assert(store.snapshot == rows, "redelivered batch must not duplicate")
    // a better key from a NEW batch displaces nothing at k=50 but joins
    store.merge(1L, Seq(SampleStream.Kept(-0.0005, 9L, "de", "web", 200L)))
    assert(store.snapshot.map(_.docId) == Seq(9L, 7L))
  }
}
