package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** End-to-end curation funnel — the stage-by-stage attrition ledger a
  * training-data pipeline publishes with every corpus release
  * (reference: overseer's curation family — q83 quality gate, q84
  * source cap, q88 chunk dedup — COMPOSED here into the audit that ties
  * them together; doc/guide/Introduction.md:3). Stages:
  * 0 raw → 1 language filter (en) → 2 exact dedup (min doc_id per
  * md5(text)) → 3 quality gate (n_chars ≥ 200) → 4 per-source cap
  * (first 15 docs by doc_id). The report is one row per stage with
  * surviving docs, surviving chars, and the drop rate vs the previous
  * stage — the number that tells you WHICH stage ate your corpus.
  *
  * Scale shape: ONE corpus scan. Every doc is tagged with its survival
  * DEPTH (the last stage it survives — well-defined because the stage
  * predicates nest), so all five stage counts come out of a single
  * 5-row depth histogram instead of five chained jobs rescanning the
  * corpus. The only shuffles are the two windows: the dedup rank (hash
  * of text — at 100 TB you'd digest on ingest and shuffle 128-bit
  * digests, never text; md5 here IS that digest) and the per-source
  * cap, both as conditional running counts so non-surviving rows can
  * share the pass. The rollup joins a 5-row spine to the ≤5-row
  * histogram; the lag() for drop_pct runs on 5 rows.
  *
  * Exactness: counts/chars BIGINT; drop_pct is one BIGINT→DOUBLE
  * division rounded at 6. Dedup keeper = min doc_id (total order, no
  * ties).
  */
object CurationFunnelOps {

  private val Cap = 15

  val q500CurationFunnel: QueryDef = QueryDef(
    "q500_curation_funnel",
    (s, dir) => {
      // ONE pass: tag every doc with its survival DEPTH (the last stage
      // it survives), then every stage's survivors are Σ_{depth ≥ k} —
      // 1 scan + 2 conditional-running-count windows, where the naive
      // "five chained frames, one agg each" plan rescans the corpus
      // five times. The stage predicates nest (s4⊆s3⊆s2⊆s1), which is
      // what makes depth well-defined and the rollup a 5-row sum.
      val docs = Tables(s, dir).documents
      val w1 = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w2 = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tagged = docs
        .withColumn("s1", col("lang") === lit("en"))
        // rank among s1 rows only: conditional running count
        .withColumn("rn1",
          sum(when(col("s1"), lit(1L)).otherwise(lit(0L))).over(w1))
        .withColumn("s2", col("s1") && col("rn1") === 1)
        .withColumn("s3", col("s2") && col("n_chars") >= 200)
        .withColumn("rn2",
          sum(when(col("s3"), lit(1L)).otherwise(lit(0L))).over(w2))
        .withColumn("s4", col("s3") && col("rn2") <= Cap)
        .select(col("n_chars"),
          when(col("s4"), lit(4L)).when(col("s3"), lit(3L))
            .when(col("s2"), lit(2L)).when(col("s1"), lit(1L))
            .otherwise(lit(0L)).as("depth"))
      val byDepth = tagged.groupBy(col("depth"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      val names = Seq(0L -> "raw", 1L -> "lang_en", 2L -> "exact_dedup",
        3L -> "quality_minlen", 4L -> "source_cap")
      import s.implicits._
      val spine = names.toDF("stage", "stage_name")
      val summary = spine
        .join(byDepth, col("depth") >= col("stage"), "left")
        .groupBy(col("stage"), col("stage_name"))
        .agg(coalesce(sum(col("n")), lit(0L)).as("docs_out"),
          coalesce(sum(col("chars")), lit(0L)).as("chars_out"))
      val w = Window.orderBy(col("stage")) // 5-row frame
      summary
        .withColumn("prev", lag(col("docs_out"), 1).over(w))
        .select(col("stage"), col("stage_name"), col("docs_out"),
          col("chars_out"),
          coalesce(round((col("prev") - col("docs_out")).cast("double") /
            col("prev").cast("double"), 6), lit(0.0)).as("drop_pct"))
        .orderBy(col("stage"))
    },
    Some(s"""WITH s1 AS (SELECT * FROM documents WHERE lang = 'en'),
      s2 AS (SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY md5(text)
            ORDER BY doc_id) AS rn FROM s1) WHERE rn = 1),
      s3 AS (SELECT * FROM s2 WHERE n_chars >= 200),
      s4 AS (SELECT * FROM (
          SELECT doc_id, n_chars, row_number() OVER (PARTITION BY source
            ORDER BY doc_id) AS rn2 FROM s3) WHERE rn2 <= $Cap),
      summary AS (
        SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
          CAST(COUNT(*) AS BIGINT) AS docs_out,
          CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS chars_out
          FROM documents
        UNION ALL SELECT 1, 'lang_en', CAST(COUNT(*) AS BIGINT),
          CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM s1
        UNION ALL SELECT 2, 'exact_dedup', CAST(COUNT(*) AS BIGINT),
          CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM s2
        UNION ALL SELECT 3, 'quality_minlen', CAST(COUNT(*) AS BIGINT),
          CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM s3
        UNION ALL SELECT 4, 'source_cap', CAST(COUNT(*) AS BIGINT),
          CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM s4)
      SELECT stage, stage_name, docs_out, chars_out,
        COALESCE(round(CAST(LAG(docs_out, 1) OVER (ORDER BY stage)
            - docs_out AS DOUBLE) /
          CAST(LAG(docs_out, 1) OVER (ORDER BY stage) AS DOUBLE), 6), 0.0)
          AS drop_pct
      FROM summary ORDER BY stage"""))

  val all: Seq[QueryDef] = Seq(q500CurationFunnel)
}
