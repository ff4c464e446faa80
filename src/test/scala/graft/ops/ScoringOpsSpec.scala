package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic contracts of the scoring & materialization wave (q94–q100)
  * beyond oracle parity: LM-score determinism on exact twins, the Zipf
  * fit's sign, the JL norm-preservation bound, full PII recall on the
  * injected patterns, packing mass conservation against q82, the outlier
  * gate's selectivity, and the capstone pipeline's stage accounting. */
class ScoringOpsSpec extends SparkTestBase {

  /** Exact-twin fixture: every sf0.001 document duplicated under a shifted
    * id — identical text must score identically under any per-document
    * text statistic. */
  private lazy val twinDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("scoring-twins").toString
    val docs = Tables(spark, sfDir).documents
    docs.union(docs.withColumn("doc_id", col("doc_id") + 10000))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q94: exact twins score identical (n_bigrams, avg_nll, ppl)") {
    val scored = ScoringOps.q94BigramPerplexity.fn(spark, twinDir)
      .withColumn("orig_id", col("doc_id") % 10000)
    val variants = scored.groupBy(col("orig_id"))
      .agg(countDistinct(col("n_bigrams"), col("avg_nll"), col("ppl")).as("v"),
           count(lit(1)).as("members"))
    assert(variants.filter(col("members") === 2).count() > 0, "twin fixture empty")
    assert(variants.filter(col("v") > 1).count() == 0,
      "identical texts got different LM scores")
  }

  test("q94: scores are positive and ppl = exp(avg_nll) within rounding") {
    val rows = ScoringOps.q94BigramPerplexity.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("avg_nll") > 0.0))
    assert(rows.forall { r =>
      math.abs(r.getAs[Double]("ppl") - math.exp(r.getAs[Double]("avg_nll"))) < 1e-3
    })
  }

  test("q95: natural-language corpus fits a negative Zipf slope over 100 terms") {
    val r = ScoringOps.q95ZipfSlope.fn(spark, sfDir).head()
    // the synthetic vocabulary is smaller than the top-100 cut at sf0.001
    val vocab = Tables(spark, sfDir).documents
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    assert(r.getAs[Long]("n_terms") == math.min(100L, vocab))
    assert(r.getAs[Double]("slope") < 0.0, "frequency must fall with rank")
    assert(r.getAs[Double]("intercept") > 0.0, "top-rank ln(freq) must be positive")
  }

  test("q96: JL projection preserves norms in expectation (mean ratio near 1)") {
    val rows = ScoringOps.q96RandomProjection.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("norm_proj") >= 0.0))
    val ratios = rows.map(_.getAs[Double]("ratio"))
    val mean = ratios.sum / ratios.length
    // E[ratio²] = 1 exactly; with k = 8 the per-vector spread is wide but
    // the corpus mean concentrates
    assert(mean > 0.7 && mean < 1.3, s"mean norm ratio $mean outside JL band")
  }

  test("q97: the injected contact line is fully detected on every document") {
    val rows = ScoringOps.q97PiiRedaction.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_emails") >= 1L), "an injected email was missed")
    assert(rows.forall(_.getAs[Long]("n_phones") >= 1L), "an injected phone was missed")
    // redaction must strictly shrink: the shortest email (user0@src0.example.com)
    // is longer than '<EMAIL>'
    assert(rows.forall(_.getAs[Long]("chars_removed") > 0L))
  }

  test("q98: shard materialization conserves q82's pack accounting exactly") {
    val shards = ScoringOps.q98TrainingShards.fn(spark, sfDir)
      .select(col("lang"), col("pack_id"), col("n_docs"), col("pack_tokens"))
    val packs = TrainingOps.q82SequencePacking.fn(spark, sfDir)
      .select(col("lang"), col("pack_id"), col("n_docs"), col("pack_tokens"))
    assert(shards.exceptAll(packs).count() == 0 && packs.exceptAll(shards).count() == 0,
      "shard payload accounting diverged from the packing assignment")
  }

  test("q98: distinct payloads — no two packs of a language share an md5") {
    val dup = ScoringOps.q98TrainingShards.fn(spark, sfDir)
      .groupBy(col("lang"), col("payload_md5")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(dup.count() == 0, "two different packs materialized identical payloads")
  }

  test("q99: the z > 1.5 gate is selective and one-sided") {
    val total = Tables(spark, sfDir).embeddings.count()
    val rows = ScoringOps.q99EmbeddingOutliers.fn(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Double]("z") > 1.5))
    assert(rows.length < total / 5,
      s"${rows.length} of $total vectors flagged — a z>1.5 gate must be a tail")
    assert(rows.forall(_.getAs[Double]("dist") > 0.0))
  }

  test("q100: stage accounting — kept ≤ gated ≤ per-lang totals, packs cover tokens") {
    val perLang = Tables(spark, sfDir).documents
      .groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val rows = ScoringOps.q100CurationV2.fn(spark, sfDir)
      .join(perLang, Seq("lang")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kept = r.getAs[Long]("n_docs_kept")
      val packs = r.getAs[Long]("n_packs")
      val toks = r.getAs[Long]("total_tokens")
      assert(kept <= r.getAs[Long]("n_total"), "kept more docs than exist")
      assert(packs >= 1 && packs <= kept, "pack count outside [1, kept]")
      // every pack starts below the 512 budget, so packs ≥ tokens/512 rounded up
      // minus slack for the last partial pack; the weak direction always holds:
      assert(packs >= toks / 512 - kept, "pack count impossibly low for token mass")
    }
  }
}
