package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic contracts of the curation wave (q86–q90) beyond oracle parity:
  * the winnowing guarantee, the quantization error bound, chunk-dedup on
  * known exact twins, mix weights summing to one, and the overlap matrix's
  * pair ordering. */
class CurationOpsSpec extends SparkTestBase {

  /** The shipped fixtures contain near-dups but no exact twins, so the
    * dup-sensitive contracts get a constructed one: every sf0.001 document
    * duplicated under a shifted id — 500 twin pairs. */
  private lazy val twinDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("curation-twins").toString
    val docs = Tables(spark, sfDir).documents
    docs.union(docs.withColumn("doc_id", col("doc_id") + 10000))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q86: winnowing guarantee — exact-duplicate docs share their full fingerprint set") {
    // twins have identical text, so identical k-grams, windows, and
    // therefore identical (n_kgrams, n_fps, fp_xor)
    val fps = CurationOps.q86Winnowing.fn(spark, twinDir)
      .withColumn("orig_id", col("doc_id") % 10000)
    val joined = fps.groupBy(col("orig_id"))
      .agg(countDistinct(col("n_kgrams"), col("n_fps"), col("fp_xor")).as("variants"),
           count(lit(1)).as("members"))
    assert(joined.filter(col("members") === 2).count() > 0, "twin fixture empty")
    assert(joined.filter(col("variants") > 1).count() == 0,
      "identical texts produced different fingerprint sets")
  }

  test("q86: fingerprints are a subset of the k-gram hashes (each fp is some window min)") {
    val row = CurationOps.q86Winnowing.fn(spark, sfDir)
      .agg(min(col("n_fps")), max(col("n_fps")), min(col("n_kgrams"))).head()
    assert(row.getLong(0) >= 1)            // every doc keeps at least one fp
    assert(row.getLong(2) >= 4)            // filter kept only window-able docs
  }

  test("q87: reconstruction error is bounded by half a quantization step") {
    // |v - deq| <= (mx-mn)/255/2 + eps for every dim; check the corpus max
    // against the widest dimension's bound
    val flat = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("pos").as("dim"), col("col").cast("double").as("v"))
    val widest = flat.groupBy(col("dim"))
      .agg((max(col("v")) - min(col("v"))).as("range"))
      .agg(max(col("range"))).head().getDouble(0)
    val worst = CurationOps.q87Int8Quant.fn(spark, sfDir)
      .agg(max(col("max_abs_err"))).head().getDouble(0)
    assert(worst <= widest / 255.0 / 2.0 + 1e-9,
      s"err $worst exceeds half-step bound ${widest / 255.0 / 2.0}")
  }

  test("q88: exact-duplicate docs with full chunks score dup_ratio 1.0") {
    // in the twin fixture EVERY chunk exists in (at least) two docs
    val scored = CurationOps.q88ChunkDedup.fn(spark, twinDir)
    assert(scored.count() > 0, "twin fixture has no docs with >= 32 tokens")
    assert(scored.filter(col("dup_ratio") < 1.0).count() == 0,
      "an exact twin's chunks were not all flagged duplicated")
  }

  test("q88: on the shipped corpus, near-dup docs carry partial chunk overlap") {
    val r = CurationOps.q88ChunkDedup.fn(spark, "/root/testdata/sf0.01")
    assert(r.filter(col("n_dup_chunks") > 0).count() > 0,
      "no cross-document chunk duplication found at sf0.01")
    assert(r.filter(col("n_dup_chunks") > col("n_chunks")).count() == 0)
  }

  test("q89: temperature weights are a distribution that upsamples low-resource langs") {
    val rows = CurationOps.q89TemperatureMix.fn(spark, sfDir).collect()
    val wSum = rows.map(_.getAs[Double]("w_temp")).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum to $wSum")
    // τ < 1 compresses the distribution: every minority lang gains weight
    // over its raw share, the majority lang loses
    val byP = rows.sortBy(_.getAs[Double]("p_raw"))
    assert(byP.head.getAs[Double]("w_temp") > byP.head.getAs[Double]("p_raw"))
    assert(byP.last.getAs[Double]("w_temp") < byP.last.getAs[Double]("p_raw"))
  }

  test("q91: BM25 scores are positive, bounded by sum of idfs, and rank term-dense docs first") {
    val rows = CurationOps.q91Bm25.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("bm25") > 0.0))
    assert(rows.forall(r => r.getAs[Long]("n_hit") >= 1 && r.getAs[Long]("n_hit") <= 3))
    // saturation bound: each term's contribution < idf * (k1 + 1), and with
    // this corpus' df ≈ N the idf is small — sanity-cap at ln(2)*2.2*3
    assert(rows.forall(_.getAs[Double]("bm25") < 3 * 2.2 * math.log(2.0) + 1e-6))
  }

  test("q92: coverage curve is monotone in k and ends at a sane share of total") {
    val rows = CurationOps.q92VocabCoverage.fn(spark, sfDir)
      .orderBy(col("top_k")).collect()
    assert(rows.map(_.getAs[Long]("top_k")).toSeq == Seq(5L, 10L, 25L))
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.sameElements(cov.sorted), "coverage must be monotone in k")
    assert(cov.last <= 1.0 && cov.head > 0.0)
    val r = rows.head
    assert(r.getAs[Long]("cum_tokens") <= r.getAs[Long]("total_tokens"))
  }

  test("q90: overlap matrix is strictly-ordered pairs with positive counts") {
    val rows = CurationOps.q90SourceOverlap.fn(spark, sfDir).collect()
    assert(rows.forall(r => r.getAs[String]("src_a") < r.getAs[String]("src_b")))
    assert(rows.forall(_.getAs[Long]("n_shared") > 0))
  }
}
