package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the second-wave corpus operators (chunking, spine,
  * n-grams, compaction, centroid assignment, histogram) beyond the DuckDB
  * oracle equality the driver gate asserts. */
class CorpusOpsSpec extends SparkTestBase {

  test("chunking covers every document with stride-40 windows of <= 50 tokens") {
    val docs = Tables(spark, sfDir).documents
      .withColumn("n", size(TextOps.tokens(col("text")))).filter(col("n") > 0)
    val chunks = CorpusOps.q58DocChunking.fn(spark, sfDir)
    val byDoc = chunks.groupBy(col("doc_id"))
      .agg(max(col("chunk_id")).as("max_c"), max(col("n_chunk_tokens")).as("max_n"),
           count(lit(1)).as("n_chunks"))
      .join(docs.select(col("doc_id"), col("n")), Seq("doc_id"))
      .collect()
    assert(byDoc.nonEmpty)
    byDoc.foreach { r =>
      val (maxC, maxN, nChunks, n) =
        (r.getAs[Long]("max_c"), r.getAs[Long]("max_n"), r.getAs[Long]("n_chunks"), r.getAs[Int]("n"))
      assert(maxN <= 50)
      assert(maxC == (n - 1) / 40, s"doc ${r.get(0)}: maxC=$maxC n=$n")
      assert(nChunks == maxC + 1)
    }
  }

  test("date spine has one row per calendar day and preserves the order total") {
    val o = Tables(spark, sfDir).orders
    val (lo, hi) = {
      val r = o.agg(min(col("o_orderdate").cast("date")), max(col("o_orderdate").cast("date"))).head()
      (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)
    }
    val spine = CorpusOps.q59DateSpine.fn(spark, sfDir)
    assert(spine.count() == java.time.temporal.ChronoUnit.DAYS.between(lo, hi) + 1)
    val totals = spine.agg(sum(col("n_orders"))).head().getLong(0)
    assert(totals == o.count())
  }

  test("bigram top-k emits at most k ranked rows per language") {
    val topk = CorpusOps.q60BigramTopk.fn(spark, sfDir).collect()
    val perLang = topk.groupBy(_.getAs[String]("lang"))
    perLang.foreach { case (_, rows) =>
      assert(rows.length <= 10)
      assert(rows.map(_.getAs[Long]("rank")).sorted.sameElements(1L to rows.length))
    }
  }

  test("event compaction never keeps more events than arrived per user") {
    val ev = EventOps.events(spark, sfDir).groupBy(col("user_id")).agg(count(lit(1)).as("n_total"))
    val kept = CorpusOps.q61EventCompaction.fn(spark, sfDir)
    val joined = kept.join(ev, Seq("user_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (k, t) = (r.getAs[Long]("n_kept"), r.getAs[Long]("n_total"))
      assert(k >= 1 && k <= t)
    }
  }

  test("centroid assignment produces exactly one label per vector with valid cosine") {
    val a = CorpusOps.q62CentroidAssign.fn(spark, sfDir)
    val n = Tables(spark, sfDir).embeddings.count()
    assert(a.count() == n)
    assert(a.select(countDistinct(col("vec_id"))).head().getLong(0) == n)
    assert(a.filter(col("best_cos") < -1.0 || col("best_cos") > 1.0).count() == 0)
  }

  test("histogram buckets partition the orders and shares sum to 100") {
    val h = CorpusOps.q63PriceHistogram.fn(spark, sfDir)
    assert(h.agg(sum(col("n"))).head().getLong(0) == Tables(spark, sfDir).orders.count())
    val pct = h.agg(sum(col("pct"))).head().getDouble(0)
    assert(math.abs(pct - 100.0) < 1e-3)
  }
}
