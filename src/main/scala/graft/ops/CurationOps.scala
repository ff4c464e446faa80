package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth wave of LLM-training-corpus operators — the curation layer:
  * winnowing fingerprints (the robust local fingerprinting scheme behind
  * MOSS-style overlap detection), int8 embedding quantization with
  * reconstruction error, cross-document duplicated-chunk ratios,
  * temperature-based multilingual mix reweighting, and a cross-source
  * contamination matrix. All pure `functions._` column algebra — no UDFs —
  * each with an exact DuckDB oracle.
  *
  * The reference delegates all handler computation to user code
  * (/root/reference/src/overseer/executor.clj:12-39); these are corpus-
  * curation handlers a training pipeline schedules through the engine.
  */
object CurationOps {

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken's MOSS
    * scheme): hash every token 3-gram (q78's md5-derived int64 so the
    * oracle rebuilds hashes bit-for-bit), slide a window of w=4 k-gram
    * hashes, keep each window's minimum, and report the distinct
    * fingerprint set per document (count + order-insensitive bit_xor
    * digest). Guarantees any shared run of ≥ w+k-1 tokens shares a
    * fingerprint — the positional near-dup primitive exact-hash dedup
    * misses. Shape: pure per-row array math (projection) until one hash
    * aggregate on (doc_id) — shuffle-free fingerprinting at any corpus
    * scale. */
  val q86Winnowing: QueryDef = QueryDef(
    "q86_winnowing",
    (s, dir) => {
      val w = 4
      Tables(s, dir).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3 + w - 1) // need ≥ w k-grams
        .withColumn("ks", expr(
          """transform(
            |  transform(sequence(0, size(toks)-3),
            |    i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2]))),
            |  h -> shiftleft(cast(conv(substring(h, 1, 8), 16, 10) as long), 32)
            |       | cast(conv(substring(h, 9, 8), 16, 10) as long))""".stripMargin))
        .withColumn("fps", expr(
          s"array_distinct(transform(sequence(0, size(ks)-$w), i -> array_min(slice(ks, i+1, $w))))"))
        .select(col("doc_id"), size(col("ks")).cast("long").as("n_kgrams"), col("fps"))
        // cut the plan before explode: projection collapse would otherwise
        // inline the whole md5→int64→window chain into the generator AND
        // both group keys, re-evaluating it once per exploded row (measured
        // 60 s → 1.5 s at sf0.01; q78 checkpoints its shared stage the
        // same way)
        .localCheckpoint()
        .select(col("doc_id"), col("n_kgrams"), explode(col("fps")).as("fp"))
        .groupBy(col("doc_id"), col("n_kgrams"))
        .agg(count(lit(1)).as("n_fps"), expr("bit_xor(fp)").as("fp_xor"))
    },
    Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      g AS (SELECT doc_id, list_transform(range(0, len(toks)-2),
          i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) AS kgs
        FROM t WHERE len(toks) >= 6),
      h AS (SELECT doc_id, list_transform(kgs, s ->
          (('0x' || substr(md5(s), 1, 8))::BIGINT
             - CASE WHEN ('0x' || substr(md5(s), 1, 8))::BIGINT >= 2147483648
                    THEN 4294967296 ELSE 0 END) * 4294967296
          + ('0x' || substr(md5(s), 9, 8))::BIGINT) AS ks FROM g),
      wnd AS (SELECT doc_id, CAST(len(ks) AS BIGINT) AS n_kgrams,
          list_distinct(list_transform(range(0, len(ks)-3),
            i -> list_min(ks[i+1:i+4]))) AS fps FROM h),
      u AS (SELECT doc_id, n_kgrams, UNNEST(fps) AS fp FROM wnd)
      SELECT doc_id, n_kgrams, CAST(COUNT(*) AS BIGINT) AS n_fps,
        bit_xor(fp) AS fp_xor FROM u GROUP BY 1, 2"""))

  /** Int8 scalar quantization of the embedding corpus: per-DIMENSION
    * min/max over the whole corpus (the quantization grid is a model
    * parameter — dim rows, broadcast), each value snapped to its 0–255
    * code, then the per-vector worst-case reconstruction error and an
    * order-insensitive code digest. The 4× compression every vector store
    * applies before ANN serving; max (not sum) keeps the parity exact —
    * no double-summation order anywhere. Shape: one tiny hash agg + one
    * broadcast join + one per-vector hash agg. */
  val q87Int8Quant: QueryDef = QueryDef(
    "q87_int8_quant",
    (s, dir) => {
      val flat = Tables(s, dir).embeddings
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").as("dim"), col("col").cast("double").as("v"))
        .localCheckpoint() // feeds the grid agg AND the requant join
      val grid = flat.groupBy(col("dim"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        .filter(col("mx") > col("mn"))
      flat.join(broadcast(grid), Seq("dim"))
        .withColumn("q",
          round((col("v") - col("mn")) / (col("mx") - col("mn")) * lit(255.0), 0).cast("long"))
        .withColumn("err",
          abs(col("v") - (col("mn") + col("q").cast("double") / lit(255.0) * (col("mx") - col("mn")))))
        .groupBy(col("vec_id"))
        .agg(round(max(col("err")), 9).as("max_abs_err"), expr("bit_xor(q)").as("q_xor"))
    },
    Some("""WITH flat AS (SELECT vec_id, t.gs - 1 AS dim, CAST(embedding[t.gs] AS DOUBLE) AS v
          FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(gs)),
      grid AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM flat
        GROUP BY 1 HAVING MAX(v) > MIN(v)),
      qd AS (SELECT f.vec_id,
          CAST(round((f.v - g.mn) / (g.mx - g.mn) * 255.0) AS BIGINT) AS q,
          f.v, g.mn, g.mx FROM flat f JOIN grid g USING (dim)),
      e AS (SELECT vec_id, q,
          abs(v - (mn + CAST(q AS DOUBLE) / 255.0 * (mx - mn))) AS err FROM qd)
      SELECT vec_id, round(MAX(err), 9) AS max_abs_err, bit_xor(q) AS q_xor
      FROM e GROUP BY 1"""))

  /** Cross-document duplicated-CHUNK ratio: split every document into
    * consecutive 32-token chunks (full chunks only), hash each, and score
    * each document by the fraction of its chunks that also appear in some
    * OTHER document — the chunk-level dedup signal (C4/RefinedWeb-style)
    * that whole-document hashing misses when a crawl re-embeds the same
    * boilerplate inside otherwise-distinct pages. Shape: explode →
    * hash-agg on the 32-byte chunk hash → equi-join back → per-doc agg;
    * every shuffle keys on a hash or doc_id. */
  val q88ChunkDedup: QueryDef = QueryDef(
    "q88_chunk_dedup",
    (s, dir) => {
      val c = 32
      val chunks = Tables(s, dir).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .withColumn("n_chunks", expr(s"CAST(size(toks) div $c AS BIGINT)"))
        .filter(col("n_chunks") >= 1)
        .withColumn("ch", expr(
          s"transform(sequence(0, CAST(n_chunks AS INT) - 1), i -> md5(concat_ws(' ', slice(toks, i*$c+1, $c))))"))
        .select(col("doc_id"), col("n_chunks"), explode(col("ch")).as("h"))
        // one checkpoint, two consumers (spread agg + the join back), and
        // it stops projection collapse re-running tokenize+md5 per row
        .localCheckpoint()
      val spread = chunks.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      chunks.join(spread, Seq("h"))
        .groupBy(col("doc_id"), col("n_chunks"))
        .agg(sum(when(col("n_docs") > 1, lit(1L)).otherwise(lit(0L))).as("n_dup_chunks"))
        .withColumn("dup_ratio",
          round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6))
    },
    Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      c AS (SELECT doc_id, CAST(len(toks) // 32 AS BIGINT) AS n_chunks,
          list_transform(range(0, len(toks) // 32),
            i -> md5(array_to_string(toks[i*32+1 : i*32+32], ' '))) AS ch
        FROM t WHERE len(toks) >= 32),
      u AS (SELECT doc_id, n_chunks, UNNEST(ch) AS h FROM c),
      spread AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM u GROUP BY 1)
      SELECT u.doc_id, u.n_chunks,
        CAST(SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        round(CAST(SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / u.n_chunks, 6) AS dup_ratio
      FROM u JOIN spread s USING (h) GROUP BY 1, 2"""))

  /** Temperature-based multilingual mix reweighting (τ = 0.5): raw
    * language shares p_l by token mass, resampled as p_l^τ / Σ p_m^τ — the
    * standard upsampling of low-resource languages in multilingual
    * pretraining mixes. τ = 0.5 is computed as sqrt, which IEEE requires
    * correctly rounded, so Spark and DuckDB agree bit-for-bit before the
    * display rounding (a library pow(x, τ) would not guarantee that).
    * Shape: one hash agg to lang granularity (5 rows), then window sums
    * over the tiny aggregate — the corpus is touched once. */
  val q89TemperatureMix: QueryDef = QueryDef(
    "q89_temperature_mix",
    (s, dir) => {
      val w = Window.partitionBy()
      Tables(s, dir).documents
        .select(col("lang"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
        .withColumn("p", col("n_tokens").cast("double") / sum(col("n_tokens")).over(w))
        .withColumn("sq", sqrt(col("p")))
        .withColumn("ssum", sum(col("sq")).over(w))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          round(col("p"), 6).as("p_raw"),
          round(col("sq") / col("ssum"), 6).as("w_temp"),
          round(col("sq") / col("ssum") * lit(1000000.0), 0).cast("long").as("expected_docs_1m"))
    },
    Some("""WITH pl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(regexp_extract_all(lower(text), '\w+'))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1),
      t AS (SELECT lang, n_docs, n_tokens,
          CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS p FROM pl),
      t2 AS (SELECT *, sqrt(p) AS sq, SUM(sqrt(p)) OVER () AS ssum FROM t)
      SELECT lang, n_docs, n_tokens, round(p, 6) AS p_raw,
        round(sq/ssum, 6) AS w_temp,
        CAST(round(sq/ssum * 1000000.0) AS BIGINT) AS expected_docs_1m FROM t2"""))

  /** Cross-source contamination matrix: which pairs of sources share
    * verbatim 32-token chunks — the provenance question behind every
    * "did our crawl sources copy each other?" audit. Distinct (source,
    * chunk-hash) pairs, self-equi-joined on the hash (each hash maps to a
    * handful of sources, so the join output is bounded by dup density,
    * never |corpus|²), counted per unordered source pair. */
  val q90SourceOverlap: QueryDef = QueryDef(
    "q90_source_overlap",
    (s, dir) => {
      val c = 32
      val d = Tables(s, dir).documents
        .select(col("source"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= c)
        .withColumn("ch", expr(
          s"transform(sequence(0, CAST(size(toks) div $c AS INT) - 1), i -> md5(concat_ws(' ', slice(toks, i*$c+1, $c))))"))
        .select(col("source"), explode(col("ch")).as("h"))
        .distinct()
        .localCheckpoint() // both sides of the self-join read this frame
      d.as("a").join(d.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared"))
    },
    Some("""WITH t AS (SELECT doc_id, source, regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      c AS (SELECT doc_id, source,
          list_transform(range(0, len(toks) // 32),
            i -> md5(array_to_string(toks[i*32+1 : i*32+32], ' '))) AS ch
        FROM t WHERE len(toks) >= 32),
      d AS (SELECT DISTINCT source, UNNEST(ch) AS h FROM c)
      SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2"""))

  /** BM25 retrieval scoring (Robertson/Spärck Jones; Lucene's non-negative
    * idf form) of the whole corpus against a fixed query term set — the
    * lexical-retrieval side of data curation (mining domain-relevant
    * training docs by keyword query). k1 = 1.2, b = 0.75. Shape: tf from
    * one hash agg filtered to the query terms BEFORE the shuffle (3-term
    * semi-filter reaches the scan), df/avgdl are tiny aggregates that
    * broadcast, per-doc score sums ≤ |query| doubles. ln + round(6) keeps
    * cross-engine parity exactly as q56's TF-IDF does. */
  val q91Bm25: QueryDef = QueryDef(
    "q91_bm25",
    (s, dir) => {
      val terms = Seq("spark", "join", "window")
      val k1 = 1.2
      val b = 0.75
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .localCheckpoint() // feeds dl, N, df, and tf
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = toks.filter(col("token").isin(terms: _*))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), Seq("token"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("idf", log(
          (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
        .withColumn("part",
          col("idf") * (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
        .groupBy(col("doc_id"))
        .agg(round(sum(col("part")), 6).as("bm25"), count(lit(1)).as("n_hit"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '\w+')) AS token
        FROM documents),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
        WHERE token IN ('spark', 'join', 'window') GROUP BY 1, 2),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1)
      SELECT tf.doc_id,
        round(SUM(
          ln((CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
          * (tf.tf * 2.2)
          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 6) AS bm25,
        CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats s
      GROUP BY 1"""))

  /** Vocabulary coverage curve: the share of total token mass covered by
    * the top-k most frequent tokens (k = 5/10/25) — the corpus
    * statistic behind tokenizer-vocabulary sizing. One token hash agg;
    * the rank/running-sum window runs over a 25-row `TakeOrdered` slice
    * (cum at rank ≤ 25 only reads rows ranked ≤ 25), NOT the
    * vocabulary frame — the vocabulary grows with the corpus, so it
    * never passes through a single-partition window (r15); the token
    * total is a plain aggregate broadcast onto the three probe rows.
    * Integer counts everywhere; the single division is identical on
    * both engines. */
  val q92VocabCoverage: QueryDef = QueryDef(
    "q92_vocab_coverage",
    (s, dir) => {
      val counts = Tables(s, dir).documents
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .localCheckpoint() // top-k slice and the total share one pass
      val total = counts.agg(sum(col("n")).as("total"))
      val top = counts.orderBy(col("n").desc, col("token").asc).limit(25)
      val w = Window.orderBy(col("n").desc, col("token").asc)
      top
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("n")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("rank").isin(5L, 10L, 25L))
        .crossJoin(broadcast(total))
        .select(col("rank").as("top_k"), col("cum").as("cum_tokens"),
          col("total").as("total_tokens"),
          round(col("cum").cast("double") / col("total"), 6).as("coverage"))
    },
    Some("""WITH counts AS (
        SELECT token, COUNT(*) AS n FROM (
          SELECT UNNEST(regexp_extract_all(lower(text), '\w+')) AS token
          FROM documents) GROUP BY 1),
      ranked AS (SELECT token, n,
          CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank,
          CAST(SUM(n) OVER (ORDER BY n DESC, token
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          CAST(SUM(n) OVER () AS BIGINT) AS total
        FROM counts)
      SELECT rank AS top_k, cum AS cum_tokens, total AS total_tokens,
        round(CAST(cum AS DOUBLE) / total, 6) AS coverage
      FROM ranked WHERE rank IN (5, 10, 25)"""))

  val all: Seq[QueryDef] = Seq(q86Winnowing, q87Int8Quant, q88ChunkDedup,
    q89TemperatureMix, q90SourceOverlap, q91Bm25, q92VocabCoverage)
}
